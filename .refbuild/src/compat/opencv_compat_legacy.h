/* Constants and helpers removed between OpenCV 2.4 and 4.x */
#ifndef OPENCV_COMPAT_LEGACY_H
#define OPENCV_COMPAT_LEGACY_H
#include <opencv2/core.hpp>
#include <opencv2/core/types_c.h>
#ifndef CV_LOAD_IMAGE_COLOR
#define CV_LOAD_IMAGE_COLOR cv::IMREAD_COLOR
#endif
#ifndef CV_LOAD_IMAGE_GRAYSCALE
#define CV_LOAD_IMAGE_GRAYSCALE cv::IMREAD_GRAYSCALE
#endif
#ifndef CV_LOAD_IMAGE_UNCHANGED
#define CV_LOAD_IMAGE_UNCHANGED cv::IMREAD_UNCHANGED
#endif

#ifdef __cplusplus
/* OpenCV 2.4 TBB-style parallel_for(BlockedRange, body) shim: run serially. */
namespace cv {
class BlockedRange {
 public:
  BlockedRange(int b, int e) : b_(b), e_(e) {}
  int begin() const { return b_; }
  int end() const { return e_; }
 private:
  int b_, e_;
};
template <typename Body>
static inline void parallel_for(const BlockedRange &r, const Body &body) {
  body(r);
}
}  // namespace cv
#endif

#ifdef __cplusplus
#include <iostream>
#include <vector>
#include <opencv2/features2d.hpp>
/* STAR and FREAK live in opencv_xfeatures2d, absent in this build: stub them
   so unused dispatch branches compile; they report and return empty. */
namespace cv {
class StarFeatureDetector {
 public:
  StarFeatureDetector(int, int, int, int, int) {}
  void detect(const cv::Mat &, std::vector<cv::KeyPoint> &kps) const {
    kps.clear();
    std::cerr << "STAR detector unavailable (no xfeatures2d)" << std::endl;
  }
};
class FREAK {
 public:
  FREAK(bool, bool, float, int) {}
  void compute(const cv::Mat &, std::vector<cv::KeyPoint> &kps,
               cv::Mat &descs) const {
    kps.clear();
    descs = cv::Mat();
    std::cerr << "FREAK descriptor unavailable (no xfeatures2d)" << std::endl;
  }
};
}  // namespace cv
#endif
#endif
