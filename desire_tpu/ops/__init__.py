"""Pallas TPU kernels + dispatch helpers.

Each op has a pure-XLA reference implementation living next to the model
code; the kernels here are drop-in replacements validated against those
references (interpret mode on CPU, compiled on TPU). Dispatch policy:
kernels run when (a) the config asks for them and (b) the default backend is
a TPU; everywhere else the XLA path runs — same math, same parameter trees.
"""

import jax


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def use_pallas(cfg) -> bool:
    return bool(getattr(cfg, "use_pallas", False)) and on_tpu()
