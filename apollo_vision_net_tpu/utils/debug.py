"""Debug-mode numerics probes: finite-stats + NaN assertions.

Parity: the reference's ``debug_nan`` probe-and-sanitize system —
``_finite_stats`` prints finite-ratio/min/max at backbone, neck and encoder
boundaries when the config flag is set
(/root/reference/projects/mmdet3d_plugin/bevformer/detectors/bevformer.py:111-151,
bevformer/modules/transformer.py:134-149,
bevformer/modules/temporal_self_attention.py:222-226).

TPU-native design: probes must work *inside* ``jit``, so they are
``jax.debug.callback`` host callbacks, and they must cost nothing when
disabled, so the enable flag is read at **trace time** (a disabled probe
traces to the identity — zero HLO). Enabling/disabling therefore requires a
retrace; use a fresh ``jax.jit`` or call ``fn.clear_cache()`` after
toggling. Tests install a sink to capture records instead of printing.

The reference's ``nan_to_num`` sanitizers are deliberately not replicated
in the hot path (bf16/f32 with f32 softmax does not exhibit the fp16
overflow they patched); ``sanitize`` is provided for opt-in use.
"""
from __future__ import annotations

import threading
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

_state = threading.local()


def _enabled() -> bool:
    return getattr(_state, "enabled", False)


def enable_probes(on: bool = True) -> None:
    """Globally enable/disable probes (trace-time flag; retrace to apply)."""
    _state.enabled = on


class capture_probes:
    """Context manager: enable probes and collect records into a list.

    Records are dicts ``{"name", "finite_ratio", "max_abs", "mean"}``
    appended by the host callback as each probed value is computed.
    """

    def __init__(self) -> None:
        self.records: List[Dict[str, float]] = []

    def __enter__(self) -> "capture_probes":
        self._prev_enabled = _enabled()
        self._prev_sink = getattr(_state, "sink", None)
        _state.enabled = True
        _state.sink = self.records.append
        return self

    def __exit__(self, *exc) -> None:
        _state.enabled = self._prev_enabled
        _state.sink = self._prev_sink


def finite_stats(x: jnp.ndarray):
    """(finite_ratio, max_abs, mean-over-finite) — reference `_finite_stats`."""
    xf = x.astype(jnp.float32)
    finite = jnp.isfinite(xf)
    ratio = jnp.mean(finite.astype(jnp.float32))
    safe = jnp.where(finite, xf, 0.0)
    max_abs = jnp.max(jnp.abs(safe))
    denom = jnp.maximum(jnp.sum(finite.astype(jnp.float32)), 1.0)
    mean = jnp.sum(safe) / denom
    return ratio, max_abs, mean


def _emit(name: str, ratio, max_abs, mean) -> None:
    rec = {
        "name": name,
        "finite_ratio": float(ratio),
        "max_abs": float(max_abs),
        "mean": float(mean),
    }
    sink: Optional[Callable] = getattr(_state, "sink", None)
    if sink is not None:
        sink(rec)
    else:
        print(
            f"[debug_nan] {name}: finite={rec['finite_ratio']:.4f} "
            f"max_abs={rec['max_abs']:.4e} mean={rec['mean']:.4e}"
        )


def probe(name: str, x: jnp.ndarray, *, force: bool = False) -> jnp.ndarray:
    """Identity passthrough that reports finite-stats when probes are on.

    Safe under jit (host callback); traces to the bare identity when
    disabled, so an always-present call site costs nothing in production.
    """
    if not (_enabled() or force):
        return x
    ratio, max_abs, mean = finite_stats(x)
    jax.debug.callback(_emit, name, ratio, max_abs, mean)
    return x


def sanitize(x: jnp.ndarray, limit: float = 1e4) -> jnp.ndarray:
    """Opt-in analog of the reference's `nan_to_num(posinf=…)` guards."""
    return jnp.nan_to_num(x, nan=0.0, posinf=limit, neginf=-limit)


def assert_all_finite(fn: Callable) -> Callable:
    """Wrap `fn` so any non-finite leaf in its output raises on the host.

    Uses `checkify`; the wrapped function executes (jittable), then
    `.throw()` raises `JaxRuntimeError` naming the offending output path.
    """
    from jax.experimental import checkify

    def checked(*args, **kwargs):
        out = fn(*args, **kwargs)
        for path, leaf in jax.tree_util.tree_flatten_with_path(out)[0]:
            if not hasattr(leaf, "dtype") or not jnp.issubdtype(
                leaf.dtype, jnp.floating
            ):
                continue
            msg = "non-finite values in output " + jax.tree_util.keystr(path)
            checkify.check(jnp.all(jnp.isfinite(leaf)), msg)
        return out

    checked_fn = checkify.checkify(checked)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
