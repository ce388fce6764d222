"""General utilities: directories, file lists, logging, timing.

Covers the role of the reference's script/util.py (safe_makedir, writelist,
readlist — SURVEY.md §2 row 7; unverified, mount empty) plus structured
logging/timing the reference lacks (SURVEY.md §5.1/§5.5).
"""

from __future__ import annotations

import collections
import contextlib
import functools
import json
import logging
import os
import time
from typing import Iterable, Iterator

import numpy as np

logger = logging.getLogger("snickery_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("SNICKERY_LOGLEVEL", "INFO"))


def safe_makedir(path: str) -> str:
    """Create *path* (and parents) if missing; return it."""
    os.makedirs(path, exist_ok=True)
    return path


def writelist(items: Iterable[str], path: str) -> None:
    """Write one item per line."""
    with open(path, "w") as f:
        f.write("\n".join(str(x) for x in items) + "\n")


def readlist(path: str) -> list[str]:
    """Read non-empty stripped lines."""
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def basenames_in(directory: str, ext: str) -> list[str]:
    """Sorted basenames (no extension) of files with extension *ext* in *directory*."""
    if not os.path.isdir(directory):
        return []
    ext = ext.lstrip(".")
    return sorted(
        os.path.splitext(fn)[0]
        for fn in os.listdir(directory)
        if fn.endswith("." + ext)
    )


class StageTimer:
    """Accumulates per-stage wall-clock timings.

    The reference has no tracing/profiling (SURVEY.md §5.1); this is the
    structured replacement.  Timings feed the RTF report in bench.py.
    """

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict[str, float]:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))

    def log(self, prefix: str = "timing") -> None:
        for name, total in self.report().items():
            logger.info("%s %-24s %8.4fs (n=%d)", prefix, name, total, self.counts[name])


def dump_json(obj, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    TPU compiles in this environment go through a remote-compile service and
    can take minutes with high variance; the on-disk cache makes second runs
    of the CLI/bench start in seconds.
    """
    import jax

    cache_dir = cache_dir or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "snickery_tpu_jax",
    )
    safe_makedir(cache_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # pragma: no cover - config keys vary by jax version
        logger.warning("could not enable compilation cache: %s", e)


@contextlib.contextmanager
def trace_profile(trace_dir: str | None) -> Iterator[None]:
    """Capture a ``jax.profiler`` device trace into *trace_dir* (viewable
    with TensorBoard / xprof / Perfetto).  No-op when *trace_dir* is falsy,
    so call sites can pass a config/CLI value straight through.

    Completes SURVEY.md §5.1 (the reference has no tracing at all; the
    TPU rebuild's obligation is "jax.profiler traces; per-stage timers;
    RTF reporting" — StageTimer and bench.py cover the other two).
    """
    if not trace_dir:
        yield
        return
    import jax

    safe_makedir(trace_dir)
    try:
        jax.profiler.start_trace(trace_dir)
    except Exception as e:  # pragma: no cover - backend-dependent
        logger.warning("could not start jax.profiler trace: %s", e)
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
            logger.info("jax.profiler trace written to %s", trace_dir)
        except Exception as e:  # pragma: no cover
            logger.warning("could not stop jax.profiler trace: %s", e)


def next_multiple(x: int, m: int) -> int:
    """Smallest multiple of *m* that is >= x (and >= m)."""
    return max(m, ((x + m - 1) // m) * m)


def warm_transfer(device=None):
    """Dispatch (async, do NOT sync) a tiny host->device transfer.

    On the axon-tunnelled TPU the FIRST transfer of a process pays a
    session-establishment stall measured at 49-210 s, independent of
    payload size (a 4 KB put stalled 210 s; every later transfer ran at
    ~50 MB/s).  ``device_put`` dispatch is async (0.04 s), so firing this
    at process start lets the stall complete concurrently with host-side
    work (voice loading, feature prep).  Returns the in-flight buffer;
    callers may sync it or simply drop it.
    """
    import jax

    if device is None:
        device = jax.devices()[0]
    return jax.device_put(np.ones(128, np.float32), device)


def colmajor_format(device):
    """Column-major (major_to_minor=(0,1)) single-device placement for a
    2-D array.  For a (M, d) f32 block with d not a multiple of 128, the
    DEFAULT row-major tiled layout lane-pads d (e.g. 152 -> 256) — the
    compiled preselect step then materialises a 1.7x-sized relayout copy
    of the whole block every execution (8 GiB at 8.4M units; the round-4
    capacity OOM).  The col-major layout is compact for the same array
    (d along sublanes, M along lanes with M % 128 == 0), so the kernel
    reads the resident block directly (scripts/exp_layout.py,
    scripts/exp_layout_full.py)."""
    from jax._src.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    return Format(Layout(major_to_minor=(0, 1)), SingleDeviceSharding(device))


def chunked_device_put(arr: np.ndarray, device=None,
                       chunk_bytes: int = 96 * 1024 * 1024, format=None):
    """Upload a host array to one device in ~chunk_bytes row slices.

    Measured on the axon tunnel (400 MB f32, post-warmup): a monolithic
    ``device_put`` moves ~11 MB/s while 32-128 MB chunks sustain
    ~40-55 MB/s (sweet spot ~96 MB; 8 MB chunks collapse to ~5 MB/s on
    per-transfer overhead).  All chunks are dispatched before the
    device-side concatenate, so the transfers pipeline; control also
    returns to Python between dispatches, which keeps signal handlers
    (bench SIGTERM/SIGALRM flush) responsive during multi-GB uploads.
    Peak device memory is ~2x the array during the concatenate.

    ``format``: optional jax Format (sharding + device layout) the
    resident array must have (e.g. :func:`colmajor_format`).  The chunked
    paths build the array in that layout directly (the in-place fill jit
    pins both in_ and out_shardings to it, so XLA updates the buffer
    without a relayout round trip).
    """
    import jax
    import jax.numpy as jnp

    if device is None:
        device = jax.devices()[0]
    placement = format if format is not None else device
    if arr.nbytes <= chunk_bytes or arr.ndim == 0 or arr.shape[0] < 2:
        return jax.device_put(arr, placement)
    row_bytes = max(1, arr.nbytes // arr.shape[0])
    step = max(1, chunk_bytes // row_bytes)
    if step >= arr.shape[0]:
        return jax.device_put(arr, placement)
    if arr.nbytes > _INPLACE_UPLOAD_BYTES or format is not None:
        # the concatenate path cannot express an output layout; the
        # in-place fill can (and peaks at ~N instead of ~2N)
        return _inplace_device_put(arr, device, step, format=format)
    parts = [jax.device_put(np.ascontiguousarray(arr[i:i + step]), device)
             for i in range(0, arr.shape[0], step)]
    return jnp.concatenate(parts, axis=0)


# Above this size the concatenate path's 2x peak HBM starts to matter
# (a 12 GiB raw block cannot be concatenated on a 16 GiB chip at all);
# below it, concatenate is kept — its fully-pipelined transfers edge out
# the windowed in-place fill on the axon tunnel.
_INPLACE_UPLOAD_BYTES = 1 << 30


def _inplace_device_put(arr, device, step, lookahead: int = 4, format=None):
    """Upload into a single preallocated device buffer (peak ~N + a few
    chunks of HBM, vs ~2N for the concatenate path).

    The destination is allocated once with ``jnp.zeros`` (no transfer)
    and every chunk lands via a jitted ``dynamic_update_slice`` whose
    buffer argument is DONATED, so XLA updates it in place.  A small
    lookahead window keeps ``lookahead`` chunk transfers in flight so the
    host->device copies still pipeline with the (cheap) update steps.
    ``format``: optional Format pinning the buffer's device layout — both
    the allocation and the fill jit carry it, so no relayout copy exists
    at any point.
    """
    import jax
    import jax.numpy as jnp

    if format is not None:
        # The persistent compilation cache on this jax/libtpu keys an
        # executable by its HLO but NOT by the requested argument/result
        # LAYOUTS: the pre-layout (row-major) zeros/fill executables from
        # an earlier run are served for the format-pinned jits, and the
        # buffer silently arrives/becomes row-major — the round-5
        # 8.4M-unit capacity failure (measured: a fresh cache honours the
        # same requests; jax.device_put cannot relayout a committed
        # multi-GiB on-device array either — measured no-op at 5 GiB).
        # Salting the HLO with a tiny layout-pinned `tag` argument that
        # FLOWS INTO the result (jit drops unused args) makes the row- and
        # col-major variants structurally different programs, so they can
        # never collide in the cache.  The tag is zeros, so setting/adding
        # its corner element changes nothing.
        tag = jax.device_put(np.zeros((128,) * arr.ndim, arr.dtype), format)
        corner = (0,) * arr.ndim
        fill_t = jax.jit(
            lambda buf, chunk, offset, _t: jax.lax.dynamic_update_slice(
                buf, chunk, (offset,) + (0,) * (buf.ndim - 1)
            ).at[corner].add(_t[corner]),
            donate_argnums=(0,),
            in_shardings=(format, None, None, format), out_shardings=format)

        def fill(buf, chunk, offset):
            return fill_t(buf, chunk, offset, tag)

        alloc = jax.jit(
            lambda _t: jnp.zeros(arr.shape, arr.dtype).at[corner].set(
                _t[corner]),
            in_shardings=(format,), out_shardings=format)
        alloc = functools.partial(alloc, tag)
    else:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fill(buf, chunk, offset):
            start = (offset,) + (0,) * (buf.ndim - 1)
            return jax.lax.dynamic_update_slice(buf, chunk, start)

        alloc = None

    with jax.default_device(device):
        buf = alloc() if alloc is not None else jnp.zeros(arr.shape, arr.dtype)
        if format is not None and (buf.format.layout.major_to_minor
                                   != format.layout.major_to_minor):
            raise RuntimeError(
                f"_inplace_device_put: alloc returned layout "
                f"{buf.format.layout.major_to_minor}, requested "
                f"{format.layout.major_to_minor} — the layout-tagged alloc "
                "should make this impossible; a relayout copy cannot repair "
                "it at this size (measured no-op), so fail loudly")
        offsets = list(range(0, arr.shape[0], step))
        in_flight = collections.deque()
        for i in offsets[:lookahead]:
            in_flight.append((jax.device_put(
                np.ascontiguousarray(arr[i:i + step]), device),
                jnp.int32(i)))
        for n, i in enumerate(offsets):
            chunk, off = in_flight.popleft()
            nxt = n + lookahead
            if nxt < len(offsets):
                j = offsets[nxt]
                in_flight.append((jax.device_put(
                    np.ascontiguousarray(arr[j:j + step]), device),
                    jnp.int32(j)))
            buf = fill(buf, chunk, off)
    if format is not None and (buf.format.layout.major_to_minor
                               != format.layout.major_to_minor):
        # never hand back a wrong-layout resident block silently: a
        # consumer jit compiled for the requested layout would either
        # reject the arg or (worse) read it transposed
        raise RuntimeError(
            f"_inplace_device_put: requested layout "
            f"{format.layout.major_to_minor} but the filled buffer is "
            f"{buf.format.layout.major_to_minor}; the fill executable "
            "dropped the result layout (stale compilation-cache entry?)")
    return buf


def bucket_length(x: int, buckets: tuple[int, ...] | list[int]) -> int:
    """Smallest bucket >= x, or round x up to a multiple of the largest bucket.

    Used to pad variable-length utterances to a small set of static shapes so
    XLA recompiles only once per bucket (SURVEY.md §7 hard part (c)).
    """
    for b in sorted(buckets):
        if x <= b:
            return b
    top = max(buckets)
    return next_multiple(x, top)
