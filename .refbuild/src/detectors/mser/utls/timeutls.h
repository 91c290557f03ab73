#ifndef __TIMEUTLS_H__
#define __TIMEUTLS_H__

#if defined(__cplusplus) || defined(c_plusplus)
extern "C" {
#endif

/* returns number of seconds spent in user space since program start */
double get_time();

#if defined(__cplusplus) || defined(c_plusplus)
}
#endif
#endif // __TIMEUTLS_HH__
