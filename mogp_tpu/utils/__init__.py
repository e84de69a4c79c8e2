"""Small shared utilities (reference: ``mogp_emulator/utils.py``)."""

from .misc import integer_bisect, k_fold_cross_validation

__all__ = ["k_fold_cross_validation", "integer_bisect"]
