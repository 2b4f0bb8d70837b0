"""Feature detector/descriptor zoo behind the reference's config names.

Parity surface: OpenCV FeatureDetector::create(detector_name) /
DescriptorExtractor::create(descriptor_name) (reference
src/GraphicEnd.cpp:63-65) with the names the reference uses or sweeps
(SIFT default, parameters.yaml:8-9; GFTT/ORB/FAST/GridFAST/STAR/SURF in
exp1_2_time.py:24-37).

All detectors emit fixed-capacity Keypoints (padded arrays + validity
mask); all descriptors emit (K,D) float32 with the same mask.
"""

from .common import Keypoints  # noqa: F401
from .registry import create_detector, create_descriptor, detect_and_describe  # noqa: F401
