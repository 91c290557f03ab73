% VL_VERSION  Obtain VLFeat version information
%   VL_VERSION() prints VLFeat version number. VL_VERSION('VERBOSE')
%   prints additional information.
%
%   STR = VL_VERSION(...) returns the ouptut in a string rather than
%   printing it.
%
%   See also: VL_HELP().

% Copyright (C) 2007-12 Andrea Vedaldi and Brian Fulkerson.
% All rights reserved.
%
% This file is part of the VLFeat library and is made available under
% the terms of the BSD license (see the COPYING file).
