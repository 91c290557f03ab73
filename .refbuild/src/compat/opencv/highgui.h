/* OpenCV 2.x legacy highgui shim: imread/imwrite live in imgcodecs now */
#ifndef COMPAT_OPENCV_HIGHGUI_H
#define COMPAT_OPENCV_HIGHGUI_H
#include <opencv2/imgcodecs.hpp>
#include <opencv2/highgui.hpp>
#include "../opencv_compat_legacy.h"
#endif
