% VL_IKMEANSPUSH  Project data on integer K-means paritions
%   I = VL_IKMEANSPUSH(X,C) projects the data X to the integer K-meanns
%   clusters of centers C returning the cluster indeces I.
%
%   See also: VL_IKMEANS(), VL_HELP().

% Copyright (C) 2007-12 Andrea Vedaldi and Brian Fulkerson.
% All rights reserved.
%
% This file is part of the VLFeat library and is made available under
% the terms of the BSD license (see the COPYING file).
