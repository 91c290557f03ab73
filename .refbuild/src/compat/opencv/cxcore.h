#ifndef COMPAT_OPENCV_CXCORE_H
#define COMPAT_OPENCV_CXCORE_H
#include <opencv2/core.hpp>
#include <opencv2/core/core_c.h>
#endif
