"""Experiment metrics: confusion matrix, trackers, voting."""

from .confusion import ConfusionMatrix  # noqa: F401
from .tracker import SegmentationTracker  # noqa: F401
