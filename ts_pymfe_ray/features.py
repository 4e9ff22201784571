"""Import hub: importing this module populates the feature registry.

Workers importing any stage get the full static plan — the engine's
equivalent of the reference's reflection over VALID_MFECLASSES
(/root/reference/tspymfe/_internal.py:134-145).
"""

import ts_pymfe_ray.functions.kernels_general  # noqa: F401
import ts_pymfe_ray.functions.kernels_global  # noqa: F401
import ts_pymfe_ray.functions.kernels_autocorr  # noqa: F401

for _mod in (
    "kernels_local",
    "kernels_freq",
    "kernels_info",
    "kernels_stat_tests",
    "kernels_model",
    "kernels_landmark",
    "kernels_randomize",
):
    try:  # groups land incrementally; missing modules are fine
        __import__(f"ts_pymfe_ray.functions.{_mod}")
    except ImportError:
        pass

from ts_pymfe_ray.registry import REGISTRY, kernels_of  # noqa: F401,E402
