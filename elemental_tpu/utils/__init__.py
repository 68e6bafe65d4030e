"""Utilities: roofline audits, benchmark harness."""
from .roofline import RooflineReport, audit, chip_specs, marginal_time
