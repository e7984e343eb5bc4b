"""Convenience alias for the long-named package."""
import sys as _sys
import stm_multifrontal_qr_factorization_empowered_by_gcn_tpu as _pkg

_sys.modules[__name__] = _pkg
