"""Two-view geometry: epipolar estimation, RANSAC, pose recovery, PnP."""
