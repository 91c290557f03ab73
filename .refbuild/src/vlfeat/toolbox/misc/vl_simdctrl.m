% VL_SIMDCTRL  Toggle VLFeat SIMD optimizations
%   VL_SIMDCTRL() returns TRUE if VLFeat SIMD optimizations are enabled
%   and FALSE otherwise.
%
%   VL_SIMDCTRL(TRUE) enables VLFeat SIMD optimizations. VL_SIMDCTRL(FALSE)
%   disables them.
%
%   See also: VL_HELP().

% Copyright (C) 2007-12 Andrea Vedaldi and Brian Fulkerson.
% All rights reserved.
%
% This file is part of the VLFeat library and is made available under
% the terms of the BSD license (see the COPYING file).
