"""Kernel-validation utilities — the TPU equivalent of the reference's
(absent) sanitizer story (SURVEY §5 'race detection / sanitizers':
jit-disable + checkify/debug_nans for kernel validation).

  * ``validation_mode()`` — context manager enabling ``jax_debug_nans``
    and ``jax_disable_jit`` so every op runs eagerly with NaN checks;
    use to localize a miscompiling/misbehaving kernel.
  * ``checked(fn)`` — wraps a jitted function with ``checkify`` so
    out-of-bounds indexing and NaN/div checks become checkable errors
    instead of silent clamps.
  * ``maybe_trace()`` — jax.profiler trace hook, enabled by the
    BMTPU_PROFILE=<dir> env var or an explicit dir (the TPU analog of
    the reference's Timer/[BENCHMARK] instrumentation, SURVEY §5
    'tracing': load the trace in TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None = None):
    """Profile the enclosed block with jax.profiler when enabled.

    Enabled when `trace_dir` is given or BMTPU_PROFILE is set; no-op
    (zero overhead) otherwise.
    """
    d = trace_dir or os.environ.get("BMTPU_PROFILE")
    if not d:
        yield
        return
    import jax

    with jax.profiler.trace(d):
        yield


@contextlib.contextmanager
def validation_mode(disable_jit: bool = True):
    import jax

    with jax.debug_nans(True):
        if disable_jit:
            with jax.disable_jit():
                yield
        else:
            yield


_live_watermark_bytes = 0


def hbm_sample() -> int:
    """Sample the live-device-array byte total and fold it into a
    process-wide watermark; returns the current total.

    The fallback HBM accounting for backends whose memory_stats() is
    None (the remote 'axon' tunnel): sum of jax.live_arrays() nbytes.
    Undercounts transient XLA workspace (scratch inside a running
    program is invisible to the array registry), so the watermark is a
    LOWER bound on the true peak — call it at batch boundaries where
    the persistent state (index tables + in-flight batch buffers)
    dominates. NOTE jax.profiler.device_memory_profile() is NOT usable
    here: on the axon PJRT tunnel it fatally aborts the process
    (PJRT_Executable_SizeOfGeneratedCodeInBytes unimplemented).
    """
    global _live_watermark_bytes
    try:
        import jax

        now = sum(a.nbytes for a in jax.live_arrays())
    except Exception:
        return 0
    if now > _live_watermark_bytes:
        _live_watermark_bytes = now
    return now


def resource_report() -> dict:
    """Peak host RSS + device HBM watermark, mirroring the reference
    harness's `/usr/bin/time -v` discipline (benchmark/README.md:89-130:
    every run records wall + maximum resident set size).

    Returns {"peak_host_rss_kb": int,
             "device_hbm_peak_bytes": int | None,
             "device_hbm_peak_source": str | None,
             "device_hbm_limit_bytes": int | None} — peak is taken from
    backend memory_stats() when exposed (source "memory_stats"), else
    from the live-array watermark accumulated by hbm_sample() (source
    "live_arrays", a lower bound excluding in-program scratch), else
    None (no sample ever taken, e.g. CPU test runs).
    """
    import resource

    out = {"peak_host_rss_kb": int(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss),
        "device_hbm_peak_bytes": None, "device_hbm_peak_source": None,
        "device_hbm_limit_bytes": None}
    try:
        import jax

        ms = jax.local_devices()[0].memory_stats()
        if ms:
            out["device_hbm_peak_bytes"] = ms.get("peak_bytes_in_use")
            out["device_hbm_peak_source"] = "memory_stats"
            out["device_hbm_limit_bytes"] = ms.get("bytes_limit")
    except Exception:
        pass
    if out["device_hbm_peak_bytes"] is None and _live_watermark_bytes:
        out["device_hbm_peak_bytes"] = _live_watermark_bytes
        out["device_hbm_peak_source"] = "live_arrays"
    return out


def checked(fn, *, errors=None):
    """checkify-wrap fn: returns (error, result); call error.throw() to
    raise on failures. Adds index OOB + float checks by default."""
    from jax.experimental import checkify

    errs = errors if errors is not None else (
        checkify.index_checks | checkify.float_checks)
    return checkify.checkify(fn, errors=errs)
