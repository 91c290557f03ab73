/* OpenCV 2.x legacy umbrella header shim for OpenCV 4 */
#ifndef COMPAT_OPENCV_CV_H
#define COMPAT_OPENCV_CV_H
#include <opencv2/core.hpp>
#include <opencv2/core/core_c.h>
#include <opencv2/imgproc.hpp>
#include <opencv2/imgproc/imgproc_c.h>
#include <opencv2/imgproc/types_c.h>
#include <opencv2/features2d.hpp>
#include <opencv2/imgcodecs.hpp>
#include "../opencv_compat_legacy.h"
#endif
