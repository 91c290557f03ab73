#ifndef FCUSTOMDEF_H
#define FCUSTOMDEF_H
typedef void (*FDsPtr) (const double*, const double *,double *, int);
typedef void (*exFDsPtr) (const double*, const double *,double *, double *, int);

#endif // FCUSTOMDEF_H
