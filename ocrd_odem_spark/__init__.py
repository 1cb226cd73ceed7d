"""ocrd-odem-spark: PySpark-native OCR-text extraction engine.

From-scratch reimplementation of ulb-sachsen-anhalt/ocrd-odem's
post-processing/extraction semantics over interleaved text+media span
tables.  See README.md for the architecture.
"""

from . import constants, schema  # noqa: F401

__version__ = "0.1.0"
