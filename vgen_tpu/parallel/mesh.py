"""Multi-chip scanning: shard_map over a device mesh.

Distribution story (SURVEY.md §2.3): the key space is data-parallel across
chips -- device d of N scans keys [base + d*B, base + (d+1)*B) per super-batch
of stride N*B; the i*G table and DFA tables are replicated; per-device match
counts/ops are psum-reduced over ICI so every chip (and the host) sees global
progress with no gather of raw results.  The reference has no distribution at
all (single wgpu queue, SURVEY.md §2.3) -- this layer is the TPU-native
replacement for both its host<->device protocol and the missing multi-node
scaling.

Multi-host: call jax.distributed.initialize() before building the mesh (the
mesh then spans all processes; each host submits its process-local base
points).  Collectives ride ICI intra-slice / DCN across hosts via XLA.
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

from vgen_tpu.crypto import secp256k1 as ec
from vgen_tpu.crypto.address import AddressFormat, AddressGenerator
from vgen_tpu.pattern import Pattern


def make_mesh(devices=None):
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("d",))


def _put_global(arr, sharding):
    """Place a host-identical numpy array onto a (possibly multi-host)
    sharding: every process computes the full array and contributes only
    its addressable shards."""
    import jax

    if jax.process_count() > 1:
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
    return jax.device_put(arr, sharding)


@functools.lru_cache(maxsize=8)
def _sharded_step(fmt: AddressFormat, n_devices: int, chain_len: int,
                  has_extras: bool, mesh_key: int, unroll: bool = False,
                  glv: bool = False):
    """Build the shard_map'd full scan step for a mesh (cached per shape)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from vgen_tpu.ops import curve, pipeline

    mesh = _MESHES[mesh_key]
    tail = pipeline.make_format_tail(fmt, unroll, glv)

    def local_step(bx, by, tx, ty, dfa_flat, dfa_accept, start, remaining,
                   *extras):
        # shapes inside shard_map: bx (1, 16) local shard; tables replicated
        x3, y3, valid = curve.batch_affine_add(
            bx[0], by[0], tx, ty, chain_len=chain_len
        )
        res = tail(x3, y3, valid, dfa_flat, dfa_accept, start, remaining[0],
                   *extras)
        # global reductions over the mesh (ICI collectives); per-device
        # results are all-gathered so EVERY host (multi-host meshes) can
        # re-derive every match from its addressable shards
        total_count = jax.lax.psum(res.count, "d")
        total_ops = jax.lax.psum(res.ops, "d")
        return (
            jax.lax.all_gather(res.count, "d"),
            jax.lax.all_gather(res.indices, "d"),
            jax.lax.all_gather(res.ops, "d"),
            jax.lax.all_gather(res.vbits, "d"),
            total_count,
            total_ops,
        )

    extra_specs = (P(),) if has_extras else ()
    kwargs = dict(
        mesh=mesh,
        in_specs=(P("d"), P("d"), P(), P(), P(), P(), P(), P("d"))
        + extra_specs,
        out_specs=(P(), P(), P(), P(), P(), P()),
    )
    try:
        fn = shard_map(local_step, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(local_step, check_rep=False, **kwargs)
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _sharded_range_step(fmt: AddressFormat, glv: bool, n_devices: int,
                        chain_len: int, has_extras: bool, mesh_key: int,
                        unroll: bool = False):
    """shard_map'd interval-matching step (pattern/intervals.py fast path +
    optional GLV 6-keys-per-add expansion) -- same mesh layout as
    _sharded_step, with the lo/hi interval bound tables replicated."""
    import jax
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from vgen_tpu.ops import curve, pipeline

    mesh = _MESHES[mesh_key]
    tail = pipeline.make_range_tail(fmt, glv, unroll)

    def local_step(bx, by, tx, ty, lo, hi, remaining, *extras):
        x3, y3, valid = curve.batch_affine_add(
            bx[0], by[0], tx, ty, chain_len=chain_len
        )
        res = tail(x3, y3, valid, lo, hi, remaining[0], *extras)
        total_count = jax.lax.psum(res.count, "d")
        total_ops = jax.lax.psum(res.ops, "d")
        return (
            jax.lax.all_gather(res.count, "d"),
            jax.lax.all_gather(res.indices, "d"),
            jax.lax.all_gather(res.ops, "d"),
            jax.lax.all_gather(res.vbits, "d"),
            total_count,
            total_ops,
        )

    extra_specs = (P(),) if has_extras else ()
    kwargs = dict(
        mesh=mesh,
        in_specs=(P("d"), P("d"), P(), P(), P(), P(), P("d")) + extra_specs,
        out_specs=(P(), P(), P(), P(), P(), P()),
    )
    try:
        fn = shard_map(local_step, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(local_step, check_rep=False, **kwargs)
    return jax.jit(fn)


_MESHES = {}


@functools.lru_cache(maxsize=8)
def _sharded_fused_step(fmt: AddressFormat, kind: str, n_states: int,
                        batch: int, chain_len: int, k_sub: int,
                        glv: bool, mesh_key: int):
    """shard_map the fused Pallas scan step (ops/pallas_fused.py) over the
    mesh: each device runs the SAME single-chip hot path (XLA inversion +
    fused VMEM-resident Pallas tail) on its own k_sub key windows, and the
    packed (k_sub, 34) results are all-gathered so every host can drain
    every window.  This keeps per-chip throughput at the single-chip fused
    rate instead of downgrading multi-chip scans to the XLA word-path tails.

    kind: "range" (interval compare) or "dfa" (on-device DFA matcher).
    Returns jitted fn(bx (D*K, 16), by, tx, ty, <matcher args>,
    remaining (D*K,)) -> (D, K, 34) int32 packed results."""
    import jax
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from vgen_tpu.ops import pallas_fused

    mesh = _MESHES[mesh_key]
    p2tr = fmt == AddressFormat.P2TR
    if kind == "range":
        if p2tr:
            step = pallas_fused.fused_p2tr_range_scan_step(
                batch, chain_len, k_sub=k_sub
            )

            def local(bx, by, tx, ty, lo, hi, remaining, wt):
                packed = step(bx, by, tx, ty, lo, hi, remaining, wt)
                return jax.lax.all_gather(packed, "d")

            in_specs = (P("d"), P("d"), P(), P(), P(), P(), P("d"), P())
        else:
            step = pallas_fused.fused_range_scan_step(
                fmt, batch, chain_len, k_sub=k_sub, glv=glv
            )

            def local(bx, by, tx, ty, lo, hi, remaining):
                packed = step(bx, by, tx, ty, lo, hi, remaining)
                return jax.lax.all_gather(packed, "d")

            in_specs = (P("d"), P("d"), P(), P(), P(), P(), P("d"))
    else:
        if p2tr:
            step = pallas_fused.fused_p2tr_scan_step(
                batch, n_states, chain_len, k_sub=k_sub
            )

            def local(bx, by, tx, ty, dfa_f32, acc_f32, start, remaining,
                      wt):
                packed = step(bx, by, tx, ty, dfa_f32, acc_f32, start,
                              remaining, wt)
                return jax.lax.all_gather(packed, "d")

            in_specs = (P("d"), P("d"), P(), P(), P(), P(), P(), P("d"),
                        P())
        else:
            step = pallas_fused.fused_scan_step(
                fmt, batch, n_states, chain_len, k_sub=k_sub, glv=glv
            )

            def local(bx, by, tx, ty, dfa_f32, acc_f32, start, remaining):
                packed = step(bx, by, tx, ty, dfa_f32, acc_f32, start,
                              remaining)
                return jax.lax.all_gather(packed, "d")

            in_specs = (P("d"), P("d"), P(), P(), P(), P(), P(), P("d"))

    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=P())
    try:
        fn = shard_map(local, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(local, check_rep=False, **kwargs)
    return jax.jit(fn)


class MeshScanner:
    """Data-parallel scanner over all devices of a mesh.

    Same scan() protocol as scan.scanner.DeviceScanner, with a key-space
    stride of n_devices * k_sub * batch per super-batch.  On accelerator
    meshes each device runs the fused Pallas hot path on k_sub windows per
    dispatch; the CPU backend (tests, fallback) uses the XLA tails.
    """

    def __init__(
        self,
        fmt: AddressFormat,
        batch_size: int = 262_144,
        chain_len: int = 256,
        mesh=None,
        k_sub: Optional[int] = None,
    ):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vgen_tpu.scan import tables

        self.fmt = fmt
        self.batch = batch_size
        self.chain_len = min(chain_len, batch_size)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size
        _MESHES[id(self.mesh)] = self.mesh
        self._mesh_key = id(self.mesh)
        # word-path (unrolled) hashes on accelerator meshes; fori_loop forms
        # on XLA:CPU (see pipeline.xla_tail_unroll)
        self._unroll = self.mesh.devices.flat[0].platform != "cpu"
        # fused Pallas kernels are Mosaic (TPU)-only
        self._fused_capable = self._unroll
        self.k_sub = k_sub if k_sub is not None else (
            8 if self._fused_capable else 1
        )

        replicated = NamedSharding(self.mesh, P())
        dev0 = self.mesh.devices.flat[0]
        if dev0.platform != "cpu" and jax.process_count() == 1:
            # build on chip, replicate device-to-device (tables.py doc:
            # host upload through the tunnel measured ~360 s for 64 MB)
            tx_d, ty_d = tables.ig_table_jax(batch_size, dev0)
            self.tx = jax.device_put(tx_d, replicated)
            self.ty = jax.device_put(ty_d, replicated)
        else:
            tx, ty = tables.ig_table_limbs(batch_size)
            self.tx = _put_global(np.asarray(tx), replicated)
            self.ty = _put_global(np.asarray(ty), replicated)
        self.extras = ()
        if fmt == AddressFormat.P2TR:
            wt = tables.window_table_u32(8)
            self.extras = (_put_global(np.asarray(wt), replicated),)
        self._sharding_d = NamedSharding(self.mesh, P("d"))
        self._replicated = replicated
        self._single_tables = None  # lazy single-device tables for
        # >TOP_K overflow recovery (see _full_window_indices)

    def _bases(self, base_scalars: Sequence[int]):
        import jax
        import jax.numpy as jnp

        from vgen_tpu.scan.tables import _ints_to_limbs

        xs, ys = [], []
        for s in base_scalars:
            pt = ec.scalar_mult_base_fast(s)
            xs.append(pt[0])
            ys.append(pt[1])
        bx = _put_global(np.asarray(_ints_to_limbs(xs)), self._sharding_d)
        by = _put_global(np.asarray(_ints_to_limbs(ys)), self._sharding_d)
        return bx, by

    PREFILTER_MAX_SURVIVORS = 8.0

    def _plan_intervals(self, pattern: Pattern, allow_glv: bool):
        """Exact intervals, else the longest-prefix over-approximation when
        selective enough (see scan.scanner.DeviceScanner._plan_intervals --
        the drain regex-filters survivors either way)."""
        from vgen_tpu.ops import pipeline

        ivs = pattern.match_intervals(self.fmt)
        if ivs is not None:
            return ivs
        pf = pattern.prefilter_intervals(self.fmt)
        if pf is None:
            return None
        pf_ivs, p = pf
        glv_mult = (
            6 if (allow_glv and self.fmt in pipeline.GLV_FORMATS) else 1
        )
        if p * self.batch * glv_mult <= self.PREFILTER_MAX_SURVIVORS:
            return pf_ivs
        return None

    def _plan(self, pattern: Pattern, allow_glv: bool):
        """Choose the execution path for this pattern: ("frange" | "fdfa" |
        "xrange" | "xdfa", glv, k_sub).  Fused Pallas paths (Mosaic) apply
        on accelerator meshes for the formats ops/pallas_fused.py supports;
        everything else uses the XLA tails with one window per device."""
        from vgen_tpu.ops import pipeline

        ivs = self._plan_intervals(pattern, allow_glv)
        glv = allow_glv and self.fmt in pipeline.GLV_FORMATS
        if self._fused_capable:
            from vgen_tpu.ops import pallas_fused

            fused_fmt = (
                self.fmt in pallas_fused.FUSED_FORMATS
                or self.fmt == AddressFormat.P2TR  # round-4 fused ladder
            )
            if ivs is not None and fused_fmt:
                return "frange", glv, self.k_sub
            if ivs is None and fused_fmt:
                dev_dfa = pattern.device_dfa(self.fmt)
                _, accept = pipeline.pad_device_dfa(dev_dfa)
                if accept.shape[0] <= 256:
                    return "fdfa", glv, self.k_sub
        return ("xrange" if ivs is not None else "xdfa"), glv, 1

    def windows_per_super(self, pattern: Pattern,
                          allow_glv: bool = False) -> int:
        """Key windows (of self.batch keys) covered by one super-batch."""
        _, _, k = self._plan(pattern, allow_glv)
        return self.n_devices * k

    def submit_super_batch(self, pattern: Pattern, base_scalar: int,
                           remaining_total: Optional[int] = None,
                           allow_glv: bool = False):
        """Dispatch one super-batch over the mesh WITHOUT blocking on the
        result (JAX async dispatch): returns an opaque handle; pass it to
        drain_packed() (or call run_super_batch) to block.

        Scans keys [base_scalar+1, base_scalar + W*B] where W =
        windows_per_super(pattern): window j (device j//k_sub, slot
        j%k_sub) covers [base_scalar + j*B + 1, base_scalar + (j+1)*B].
        Interval-compilable patterns take the range-compare fast path; with
        allow_glv (random scans) GLV-capable formats check the 6
        endomorphism variants per position (self.glv_active records the
        choice -- the caller must then re-derive all variants of an
        index)."""
        import jax.numpy as jnp

        from vgen_tpu.ops import pipeline

        kind, glv, k_sub = self._plan(pattern, allow_glv)
        self.glv_active = glv
        windows = self.n_devices * k_sub
        base_scalars = [
            base_scalar + j * self.batch for j in range(windows)
        ]
        bx, by = self._bases(base_scalars)
        if remaining_total is None:
            rem = [self.batch] * windows
        else:
            rem = [
                max(0, min(self.batch, remaining_total - j * self.batch))
                for j in range(windows)
            ]
        rem_np = np.asarray(rem, dtype=np.int32)

        if kind in ("frange", "fdfa"):
            # fused Pallas hot path, k_sub windows per device per dispatch;
            # step expects per-device (K, 16) bases / (K,) remaining
            rem_dev = _put_global(rem_np, self._sharding_d)
            # self.extras is () except P2TR (replicated window table)
            if kind == "frange":
                ivs = self._plan_intervals(pattern, allow_glv)
                lo, hi = pipeline.intervals_to_words(
                    ivs, pipeline.INTERVAL_WORDS[self.fmt],
                    n_slots=pipeline.interval_slot_count(len(ivs)),
                )
                step = _sharded_fused_step(
                    self.fmt, "range", 0, self.batch, self.chain_len,
                    k_sub, glv, self._mesh_key,
                )
                packed = step(
                    bx, by, self.tx, self.ty,
                    jnp.asarray(lo), jnp.asarray(hi), rem_dev,
                    *self.extras,
                )
            else:
                dev_dfa = pattern.device_dfa(self.fmt)
                flat, accept = pipeline.pad_device_dfa(dev_dfa)
                S = accept.shape[0]
                step = _sharded_fused_step(
                    self.fmt, "dfa", S, self.batch, self.chain_len,
                    k_sub, glv, self._mesh_key,
                )
                packed = step(
                    bx, by, self.tx, self.ty,
                    jnp.asarray(flat.reshape(S, -1).astype(np.float32)),
                    jnp.asarray(accept.astype(np.float32).reshape(S, 1)),
                    jnp.int32(dev_dfa.start), rem_dev, *self.extras,
                )
            # start the tiny result copy now; a blocking np.asarray at
            # drain pays the device-link RTT serialized against compute
            # (scan/scanner.py submit, same rationale)
            try:
                packed.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
            return ("fused", packed)

        rem_dev = _put_global(rem_np, self._sharding_d)
        if kind == "xrange":
            ivs = self._plan_intervals(pattern, allow_glv)
            lo, hi = pipeline.intervals_to_words(
                ivs, pipeline.INTERVAL_WORDS[self.fmt],
                n_slots=pipeline.interval_slot_count(len(ivs)),
            )
            step = _sharded_range_step(
                self.fmt, glv, self.n_devices, self.chain_len,
                bool(self.extras), self._mesh_key, self._unroll,
            )
            out = step(
                bx, by, self.tx, self.ty,
                jnp.asarray(lo), jnp.asarray(hi), rem_dev, *self.extras,
            )
        else:
            dev_dfa = pattern.device_dfa(self.fmt)
            flat, accept = pipeline.pad_device_dfa(dev_dfa)
            step = _sharded_step(
                self.fmt, self.n_devices, self.chain_len, bool(self.extras),
                self._mesh_key, self._unroll, glv,
            )
            out = step(
                bx,
                by,
                self.tx,
                self.ty,
                jnp.asarray(flat),
                jnp.asarray(accept),
                jnp.int32(dev_dfa.start),
                rem_dev,
                *self.extras,
            )
        return ("xla", out)

    @staticmethod
    def drain_packed(handle) -> np.ndarray:
        """Block on a submit_super_batch handle -> (W, 34) int32 packed
        per-window results [count, ops, idx0..15, vbits0..15]."""
        kind, out = handle
        if kind == "fused":
            arr = np.asarray(out)  # (D, K, 34)
            return arr.reshape(-1, arr.shape[-1])
        counts, indices, ops, vbits, _total_count, _total_ops = out
        counts = np.asarray(counts)[:, None]
        ops = np.asarray(ops)[:, None]
        indices = np.asarray(indices)
        vbits = np.asarray(vbits)
        return np.concatenate(
            [counts, ops, indices, vbits], axis=1
        ).astype(np.int64)

    def _full_window_indices(self, pattern: Pattern, base_scalar: int,
                             remaining: int) -> dict:
        """Complete {match index: variant bitmask} map for one window.

        Overflow recovery (count > TOP_K index slots): re-run the window
        single-device through a full-mask step and pull the whole (batch,)
        match vector (the reference reports every match, gpu.rs:1030-1093).
        Uses process-local default-device tables, independent of the mesh."""
        import jax.numpy as jnp

        from vgen_tpu.ops import pipeline
        from vgen_tpu.scan import tables
        from vgen_tpu.scan.tables import _ints_to_limbs

        if self._single_tables is None:
            tx, ty = tables.ig_table_arrays(self.batch)
            extras = ()
            if self.fmt == AddressFormat.P2TR:
                extras = (jnp.asarray(tables.window_table_u32(8)),)
            self._single_tables = (tx, ty, extras)
        tx, ty, extras = self._single_tables
        pt = ec.scalar_mult_base_fast(base_scalar)
        bx = jnp.asarray(_ints_to_limbs([pt[0]])[0])
        by = jnp.asarray(_ints_to_limbs([pt[1]])[0])
        ivs = self._plan_intervals(pattern, self.glv_active)
        if ivs is not None:
            lo, hi = pipeline.intervals_to_words(
                ivs, pipeline.INTERVAL_WORDS[self.fmt],
                n_slots=pipeline.interval_slot_count(len(ivs)),
            )
            mask = pipeline.run_range_scan_mask(
                self.fmt, bx, by, tx, ty, lo, hi, remaining,
                extras=extras, chain_len=self.chain_len,
                glv=self.glv_active,
            )
        else:
            dev_dfa = pattern.device_dfa(self.fmt)
            flat, accept = pipeline.pad_device_dfa(dev_dfa)
            mask = pipeline.run_scan_mask(
                self.fmt, bx, by, tx, ty, jnp.asarray(flat),
                jnp.asarray(accept), dev_dfa.start, remaining,
                extras=extras, chain_len=self.chain_len,
                glv=self.glv_active,
            )
        m = np.asarray(mask)
        return {int(i): int(m[i]) for i in np.nonzero(m)[0]}

    def run_super_batch(self, pattern: Pattern, base_scalar: int,
                        remaining_total: Optional[int] = None,
                        allow_glv: bool = False):
        """submit_super_batch + block: numpy (per-window counts, indices,
        ops, total_count, total_ops).  One row per key window (n_devices
        windows on the XLA paths; n_devices * k_sub on the fused paths)."""
        from vgen_tpu.ops import pipeline

        arr = self.drain_packed(self.submit_super_batch(
            pattern, base_scalar, remaining_total, allow_glv
        ))
        return (
            arr[:, 0],
            arr[:, 2:2 + pipeline.TOP_K],
            arr[:, 1],
            int(arr[:, 0].sum()),
            int(arr[:, 1].sum()),
        )

    def scan(
        self,
        pattern: Pattern,
        count: int = 1,
        start: Optional[int] = None,
        end: Optional[int] = None,
        progress_callback=None,
        stop_flag=None,
        max_super_batches: Optional[int] = None,
        checkpoint=None,
        in_flight: int = 2,
    ):
        """Multi-device scan -> scan.scanner.ScanResult.

        Pipelined like scan.scanner.DeviceScanner: up to ``in_flight``
        super-batches are dispatched before the first is drained, so mesh
        compute overlaps host re-derivation (the double-buffering the
        reference does with two GPU frames, gpu.rs:399,973-995).  For range
        scans a scan.checkpoint.CheckpointManager persists the per-mesh
        cursor (contiguous-completed prefix) and found keys."""
        import secrets as _secrets
        from collections import deque

        from vgen_tpu.scan.scanner import (
            ScanResult, StopFlag, _derive_checked, _derive_checked_bulk,
        )

        import jax

        is_range = start is not None
        stride = self.batch * self.windows_per_super(
            pattern, allow_glv=not is_range
        )
        # multi-host: every process sees every match (indices are
        # all-gathered over the mesh), so only process 0 persists cursors
        ckpt = (
            checkpoint
            if is_range and jax.process_index() == 0 else None
        )
        gen = AddressGenerator(self.fmt)
        matches = []
        total_ops = 0
        if is_range:
            next_key = max(start, 2)
            end_key = min(end if end is not None else ec.N - 1, ec.N - 1)
            if ckpt is not None:
                state = ckpt.load()
                if state is not None:
                    next_key = max(next_key, state["next_key"])
                    total_ops = state["operations"]
                    for k in state["match_keys"]:
                        ga = _derive_checked(k, self.fmt, gen)
                        if ga is not None:
                            matches.append(ga)
        else:
            next_key = 2 + _secrets.randbelow(ec.N - stride - 3)
            end_key = None
        stop = stop_flag or StopFlag()
        target = count if count > 0 else float("inf")
        batches = 0
        inflight = deque()
        t0 = time.time()

        def submit():
            nonlocal next_key, batches
            if is_range and next_key > end_key:
                return False
            if max_super_batches is not None and batches >= max_super_batches:
                return False
            base_scalar = next_key - 1
            remaining = end_key - next_key + 1 if is_range else None
            out = self.submit_super_batch(
                pattern, base_scalar, remaining, allow_glv=not is_range
            )
            inflight.append((base_scalar, out))
            batches += 1
            nk = next_key + stride
            if not is_range and nk + 2 * stride >= ec.N:
                # wrap: restart uniformly over the FULL key space (minus
                # headroom for the next super-batch)
                nk = 2 + _secrets.randbelow(ec.N - 2 - 2 * stride)
            next_key = nk
            return True

        def drain_one():
            nonlocal total_ops
            base_scalar, out = inflight.popleft()
            arr = self.drain_packed(out)  # blocks on the super-batch
            total_ops += int(arr[:, 1].sum())
            from vgen_tpu.ops import pipeline as _pl

            K_slots = _pl.TOP_K
            cand_keys = []  # all windows of the super-batch, in order
            # device-confirmed indices collected so far this super-batch
            # (each derives to >= 1 real match); see scan.scanner drain_one
            guaranteed = 0
            for j in range(arr.shape[0]):
                base_d = base_scalar + j * self.batch
                count = int(arr[j, 0])
                pairs = {
                    int(i): int(b)
                    for i, b in zip(
                        arr[j, 2:2 + K_slots],
                        arr[j, 2 + K_slots:2 + 2 * K_slots],
                    )
                    if i >= 0
                }
                idxs = sorted(pairs)
                if count > len(idxs) and (
                    is_range
                    or (
                        target != float("inf")
                        and len(matches) + len(cand_keys)
                        + len(idxs) * (6 if self.glv_active else 1)
                        < target
                    )
                ):
                    # more matches than TOP_K result slots: RANGE scans
                    # always recover (every key must be reported); RANDOM
                    # scans recover only when the truncated slots cannot
                    # reach the requested count (see scan.scanner drain_one)
                    rem_d = (
                        max(0, min(self.batch, end_key - base_d))
                        if is_range else self.batch
                    )
                    pairs = self._full_window_indices(pattern, base_d, rem_d)
                    idxs = sorted(pairs)
                # host-check the masked tx == bx doubling slot
                # (key == 2*base_d; deterministic when base_d <= batch --
                # see scan.scanner drain_one)
                if 1 <= base_d <= self.batch and (
                    not is_range or 2 * base_d <= end_key
                ):
                    dj = base_d - 1
                    if dj not in pairs:
                        pairs[dj] = 0  # bits unknown: check all variants
                        idxs = sorted(pairs)
                    total_ops += 6 if self.glv_active else 1
                pexact = self.fmt in _pl.GLV_EXACT_Y
                if idxs and len(matches) + guaranteed < target:
                    for idx in idxs:
                        key0 = base_d + 1 + idx
                        cand_keys.extend(
                            ec.glv_bit_variant_keys(
                                key0, pairs.get(idx, 0), parity_exact=pexact
                            )
                            if self.glv_active else [key0]
                        )
                    guaranteed += sum(
                        1 for idx in idxs if pairs.get(idx, 0) != 0
                    )
            # one threaded native call for the whole super-batch's
            # candidates (see scan.scanner drain_one)
            for key, ga in _derive_checked_bulk(cand_keys, self.fmt, gen):
                if len(matches) >= target:
                    break
                if ga is not None and pattern.matches(ga.address):
                    matches.append(ga)
            if ckpt is not None:
                done_end = base_scalar + stride
                ckpt.advance(
                    min(done_end + 1, end_key + 1), total_ops,
                    [int(m.hex, 16) for m in matches],
                )
            if progress_callback:
                progress_callback(total_ops)

        while True:
            if stop.is_set() or len(matches) >= target:
                break
            while len(inflight) < max(1, in_flight):
                if not submit():
                    break
            if not inflight:
                break  # range exhausted or batch budget reached
            drain_one()

        # drain remaining in-flight batches (their matches still count)
        while inflight and len(matches) < target:
            drain_one()

        if ckpt is not None:
            ckpt.finalize()
        return ScanResult(
            matches=matches, operations=total_ops,
            elapsed_secs=time.time() - t0,
        )
