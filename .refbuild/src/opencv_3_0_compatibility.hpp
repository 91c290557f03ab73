#ifndef OPENCV_3_0_COMPATIBILITY_HPP
#define OPENCV_3_0_COMPATIBILITY_HPP

#if CV_VERSION_MAJOR >= 3
#include <opencv2/imgcodecs/imgcodecs.hpp>

#ifndef CV_YCrCb2BGR
#define CV_YCrCb2BGR cv::COLOR_YCrCb2BGR
#endif
#ifndef CV_GRAY2BGR
#define CV_GRAY2BGR cv::COLOR_GRAY2BGR
#endif
#ifndef CV_GRAY2RGB
#define CV_GRAY2RGB cv::COLOR_GRAY2RGB
#endif
#ifndef CV_BGR2GRAY
#define CV_BGR2GRAY cv::COLOR_BGR2GRAY
#endif
#ifndef CV_BGR2YCrCb
#define CV_BGR2YCrCb cv::COLOR_BGR2YCrCb
#endif
#ifndef CV_IMWRITE_JPEG_QUALITY
#define CV_IMWRITE_JPEG_QUALITY cv::IMWRITE_JPEG_QUALITY
#endif
#ifndef CV_LOAD_IMAGE_COLOR
#define CV_LOAD_IMAGE_COLOR cv::IMREAD_COLOR
#endif
#ifndef CV_LOAD_IMAGE_GRAYSCALE
#define CV_LOAD_IMAGE_GRAYSCALE cv::IMREAD_GRAYSCALE
#endif
#ifndef CV_AA
#define CV_AA cv::LINE_AA
#endif
#ifndef CV_RANSAC
#define CV_RANSAC cv::RANSAC
#endif
#ifndef CV_RGB
#define CV_RGB(r, g, b) cv::Scalar((b), (g), (r), 0)
#endif
#endif // CV_VERSION_MAJOR >= 3

#endif // OPENCV_3_0_COMPATIBILITY_HPP
