/*  heigval.c    CCMATH mathematics library source code.
 *
 *  Copyright (C)  2000   Daniel A. Atkinson    All rights reserved.
 *  This code may be redistributed under the terms of the GNU library
 *  public license (LGPL). ( See the lgpl.license file for details.)
 * ------------------------------------------------------------------------
 */
#include <stdlib.h>
#include "complex.h"
#include "matutl.h"
void heigval(Cpx *a,double *ev,int n)
{ double *dp;
  dp=(double *)calloc(n,sizeof(double));
  chouse(a,ev,dp,n);
  qreval(ev,dp,n);
  free(dp);
}
