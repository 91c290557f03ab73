% VL_ERFILL  Fill extremal region
%  MEMBERS=VL_ERFILL(I,ER) returns the list MEMBERS of the pixels which
%  belongs to the extremal region represented by the pixel ER.
%
%  The selected region is the one that contains pixel ER and of
%  intensity I(ER).
%
%  I must be of class UINT8 and ER must be a (scalar) index of the
%  region representative point.
%
%  See also: VL_MSER(), VL_HELP().

% Copyright (C) 2007-12 Andrea Vedaldi and Brian Fulkerson.
% All rights reserved.
%
% This file is part of the VLFeat library and is made available under
% the terms of the BSD license (see the COPYING file).
