"""µ-law companding (RawWaveformLabelGen.py:164-173 parity), as pure
functions usable on host (numpy in) or device (jnp in)."""

import jax.numpy as jnp
import numpy as np


def mulaw(x, mu=255):
    xp = jnp if isinstance(x, jnp.ndarray) else np
    mu = float(mu)
    return xp.sign(x) * xp.log1p(mu * xp.abs(x)) / xp.log1p(mu)


def inv_mulaw(y, mu=255):
    xp = jnp if isinstance(y, jnp.ndarray) else np
    mu = float(mu)
    return xp.sign(y) * (1.0 / mu) * ((1.0 + mu) ** xp.abs(y) - 1.0)


def mulaw_quantize(x, mu=255):
    """[-1, 1] float -> [0, mu] int."""
    y = mulaw(x, mu)
    xp = jnp if isinstance(y, jnp.ndarray) else np
    return xp.floor((y + 1) / 2 * mu + 0.5).astype(
        jnp.int32 if xp is jnp else np.int64)

def inv_mulaw_quantize(y, mu=255):
    """[0, mu] int -> [-1, 1] float."""
    x = 2.0 * y.astype(jnp.float32 if isinstance(y, jnp.ndarray)
                       else np.float32) / mu - 1.0
    return inv_mulaw(x, mu)
