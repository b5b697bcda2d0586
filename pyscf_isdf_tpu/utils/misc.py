"""Small host-side utilities."""
import numpy as np


def device_complex(x, dtype=None):
    """Host -> device transfer of a complex array, runtime-portable.

    The tunneled axon TPU runtime rejects complex ``device_put`` AND
    device-side dtype widening (both UNIMPLEMENTED, measured round 5);
    shipping the (real, imag) float parts separately and combining them
    on device with ``lax.complex`` works on every backend. Real input is
    promoted to the requested complex dtype. Already-on-device complex
    arrays pass through (with an on-device cast if needed).
    """
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.complex64
    cdt = jnp.dtype(dtype)
    rdt = jnp.float64 if cdt == jnp.complex128 else jnp.float32
    if isinstance(x, jax.Array):
        if jnp.iscomplexobj(x):
            return x.astype(cdt) if x.dtype != cdt else x
        z = x.astype(rdt)
        return jax.lax.complex(z, jnp.zeros_like(z))
    x = np.asarray(x)
    re = jnp.asarray(np.ascontiguousarray(x.real, dtype=rdt))
    if not np.iscomplexobj(x):
        return jax.lax.complex(re, jnp.zeros_like(re))
    im = jnp.asarray(np.ascontiguousarray(x.imag, dtype=rdt))
    return jax.lax.complex(re, im)


def host_complex(x) -> np.ndarray:
    """Device -> host transfer of a complex array (complex128 result).

    Splits into real/imag ON DEVICE first — complex D2H is UNIMPLEMENTED
    on the axon TPU runtime; float D2H works everywhere.
    """
    import jax.numpy as jnp

    re = np.asarray(jnp.real(x), dtype=np.float64)
    im = np.asarray(jnp.imag(x), dtype=np.float64)
    return re + 1j * im


def fingerprint(a) -> float:
    """Deterministic scalar fingerprint of an array.

    Same definition as the reference's ``lib.fp``
    (/root/reference/pyscf/lib/misc.py:1150) so golden fingerprint values from
    the reference test suite can be asserted directly.
    """
    a = np.asarray(a)
    return np.dot(np.cos(np.arange(a.size)), a.ravel())
