"""Pallas TPU kernels for ops XLA lowers poorly."""

from .deform_gather import sample_bilinear_rows, pallas_available
