"""Pure-NumPy DFXP oracle re-deriving the reference semantics
(/root/reference/dynamic_fixed_point.py:4-94) for golden tests."""

import numpy as np


def multiplier(bits, exp):
    return np.float32(2.0) ** np.float32(bits - 1 - exp)


def quantize(x, bits, exp):
    """Deterministic DFXP fake-quant (round-half-even, like tf.round)."""
    if bits >= 32:
        return np.asarray(x, np.float32)
    x = np.asarray(x, np.float32)
    mult = multiplier(bits, exp)
    limit = np.float32(2 ** (bits - 1))
    scaled = np.clip(x * mult, -limit, limit - 1)
    # np.round is round-half-to-even, matching tf.round / jnp.round
    return np.round(scaled).astype(np.float32) / mult


def quantize_stochastic(x, bits, exp, noise):
    """Stochastic path: floor(clip(x*mult + u)) / mult (reference :32-38).
    ``noise`` must be broadcastable to x (the reference draws shape
    x.shape[1:], shared across axis 0)."""
    x = np.asarray(x, np.float32)
    mult = multiplier(bits, exp)
    limit = np.float32(2 ** (bits - 1))
    scaled = np.clip(x * mult + noise, -limit, limit - 1)
    return np.floor(scaled).astype(np.float32) / mult


def overflow_rates(x, bits, exp):
    x = np.asarray(x, np.float32)
    mult = multiplier(bits, exp)
    limit = np.float32(2 ** (bits - 1))
    s = x * mult
    ovf = np.mean((s >= limit) | (s < -limit))
    ovf2 = np.mean((s >= limit / 2) | (s < -limit / 2))
    return np.float32(ovf), np.float32(ovf2)


def update_exponent(exp, ovf, ovf2, bits, target=0.0):
    if ovf > target:
        delta = 1
    elif ovf2 <= target:
        delta = -1
    else:
        delta = 0
    return min(bits - 1, exp + delta)
