"""The bake pipeline: work-item setup -> classify -> dedup -> pack.

TPU-native rebuild of the reference CPU baker's 11-stage pipeline
(`/root/reference/libraries/omm-lib/src/bake_cpu_impl.cpp`, BakeImpl
:1923-1985).  Host stages (setup, dedup, packing) are numpy; the
classification stages dispatch to an engine backend ('numpy' oracle, 'jax',
or 'pallas' — see omm_tpu.engine / omm_tpu.kernels.pallas_classify).

Output is bit-exact with the reference: the acceptance gate is equality of
Debug::Stats against the reference test suite's hard-coded expectations
(support/tests/test_omm_bake_cpu.cpp).
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np

from . import engine, geom, native
from .bit_tricks import xy_to_morton
from .mt19937 import MT19937
from .texture import Texture, get_tex_coord
from .types import (BakeError, BakeFlags, BakeInputDesc, BakeResult, Format,
                    IndexFormat, MicromapDesc, OpacityState, Result,
                    SpecialIndex, TextureAddressMode, TextureFilterMode,
                    UsageCount, get_bit_count, get_num_micro_triangles,
                    is_compatible, MAX_NUM_SUBDIV_LEVELS,
                    MAX_SUBDIV_LEVEL)

UO = int(OpacityState.UnknownOpaque)
UT = int(OpacityState.UnknownTransparent)


def _bake_trace():
    """OMM_BAKE_TRACE=1: stderr wall-clock marks for bake()'s top-level
    stages (the e2e-vs-engine gap attribution tool; device-time breakdown
    lives in OMM_TP_TRACE / tools/profile_chain.py)."""
    if not os.environ.get("OMM_BAKE_TRACE"):
        return lambda label: None
    import sys
    import time as _t
    last = [_t.perf_counter()]

    def mark(label):
        now = _t.perf_counter()
        print(f"bake_trace {label:16s} {1e3 * (now - last[0]):8.2f} ms",
              file=sys.stderr, flush=True)
        last[0] = now
    return mark

NO_SPECIAL_INDEX = 0  # OmmWorkItem::kNoSpecialIndex (bake_cpu_impl.cpp:456)

#: shared frozen all-UnknownOpaque state arrays, one per subdivision level
#: (see WorkItem.__post_init__)
_FRESH_TEMPLATES: dict[int, np.ndarray] = {}


def _fresh_template(level: int) -> np.ndarray:
    t = _FRESH_TEMPLATES.get(level)
    if t is None:
        t = np.full(get_num_micro_triangles(level), UO, dtype=np.uint8)
        t.flags.writeable = False
        _FRESH_TEMPLATES[level] = t
    return t


@dataclass
class WorkItem:
    """OmmWorkItem (bake_cpu_impl.cpp:436-462).

    `states` is a property (attached below the class): the device engine
    can hand back a serialize-ready PackedStates (sequential 2-bit rows,
    kernels/twophase.PackedStates) via set_packed_states(); the (4^N,)
    uint8 array then materializes lazily on first read, so the packed
    fast path (dedup by post digest, promotion by post uniform, blob
    memcpy in serialize_result) never touches the unpacked bytes."""

    subdivision_level: int
    vm_format: Format
    uv_tri: np.ndarray              # (3, 2) fp32
    primitive_indices: list[int]
    states: np.ndarray = None       # (4^N,) uint8; init UnknownOpaque
    special_index: int = NO_SPECIAL_INDEX
    desc_offset: int = 0xFFFFFFFF
    #: cached (states3 digest, uniform value) from the classify engine's
    #: fused post pass (native.row_post); auto-cleared whenever `states`
    #: is reassigned (merges/downsampling build NEW arrays, so attribute
    #: assignment is the invalidation point)
    post: tuple | None = None

    def __setattr__(self, name, value):
        if name == "states":
            object.__setattr__(self, "post", None)
            object.__setattr__(self, "_fresh", False)
        elif name == "post" and value is not None:
            # The cache is only valid while `states` stays byte-identical;
            # reassignment invalidates it above, and in-place writes must
            # fail loudly rather than leave a stale digest live.
            s = self.__dict__.get("_states")
            if s is not None:
                s.flags.writeable = False
        object.__setattr__(self, name, value)

    def __post_init__(self):
        if self.__dict__.get("_states") is None \
                and self.__dict__.get("_packed2") is None:
            # provably all-UnknownOpaque and untouched: lets the bake
            # pass `states=None` to the classify engine (its declared
            # fresh-item form — no per-item min() scan); any later
            # `states` assignment clears the flag via __setattr__.
            # The template is frozen (writeable=False) so an in-place
            # write can't silently break the invariant, which also makes
            # it safe to SHARE one array across all fresh items of a
            # level — setup_work_items was spending ~35 ms/bake on
            # per-item np.full memsets the classify engine immediately
            # replaces (reassignment installs a fresh writable array).
            self.states = _fresh_template(self.subdivision_level)
            object.__setattr__(self, "_fresh", True)

    def set_packed_states(self, packed, post: tuple | None = None):
        """Install a PackedStates result (+ its fused post cache): the
        canonical bytes are the packed rows until someone reads .states,
        which materializes (and freezes) the unpacked array."""
        self.states = None            # clears post/_fresh via the hook
        self.__dict__["_packed2"] = packed
        if post is not None:
            self.post = post

    def packed2(self):
        """The serialize-ready sequential 2-bit rows, or None.  Valid
        whenever present: any states reassignment clears it, and the
        lazily-materialized array is frozen, so the packed bytes always
        mirror the logical states."""
        return self.__dict__.get("_packed2")

    def has_special_index(self) -> bool:
        return self.special_index != NO_SPECIAL_INDEX

    def states3(self) -> np.ndarray:
        """3-state view: UT==UO (OmmArrayDataView, bake_cpu_impl.cpp:374-377)."""
        return np.where(self.states == UT, np.uint8(UO), self.states)


def _workitem_states_get(self):
    d = self.__dict__
    s = d.get("_states")
    if s is None:
        pk = d.get("_packed2")
        if pk is not None:
            s = pk.unpack()
            # frozen like the post-cache contract: consumers copy before
            # mutating, and the packed rows stay authoritative
            s.flags.writeable = False
            d["_states"] = s
    return s


def _workitem_states_set(self, value):
    d = self.__dict__
    d["_states"] = value
    d["_packed2"] = None


WorkItem.states = property(_workitem_states_get, _workitem_states_set)


def split_tail_light(seq, schedule):
    """Split seq into batches by a descending size schedule: the head
    size repeats while enough items remain, then the tail sizes apply
    in order.  [128, 96, 32] over 256 items -> [128, 96, 32]; over 512
    -> [128, 128, 128, 96, 32].  The pipelined engine's LAST batch sets
    its non-overlapped fetch+reconstruct tail, so a small final batch
    raises end-to-end throughput (a plain fixed size is schedule=[n])."""
    head, tail = schedule[0], schedule[1:]
    tail_sum = sum(tail)
    out = []
    o = 0
    while len(seq) - o - tail_sum >= head:
        out.append(seq[o:o + head])
        o += head
    for s in tail:
        if o >= len(seq):
            break
        out.append(seq[o:o + s])
        o += s
    if o < len(seq):
        out.append(seq[o:])
    return out


# ---------------------------------------------------------------------------
# Subdivision-level heuristics (bake_cpu_impl.cpp:470-560)
# ---------------------------------------------------------------------------

def _next_pow2_u32(v: int) -> int:
    v &= 0xFFFFFFFF
    v = (v - 1) & 0xFFFFFFFF
    v |= v >> 1
    v |= v >> 2
    v |= v >> 4
    v |= v >> 8
    v |= v >> 16
    return (v + 1) & 0xFFFFFFFF


def _log2_u32(v: int) -> int:
    return max(v.bit_length() - 1, 0)


def compute_area_heuristic(desc: BakeInputDesc, uv_tri: np.ndarray,
                           tex_size) -> int:
    """bake_cpu_impl.cpp:470-509."""
    sizef = np.array(tex_size, dtype=np.float32)
    scaled = uv_tri.astype(np.float32) * sizef
    pixel_uv_area = float(geom.uv_area(scaled))
    target = np.float32(desc.dynamic_subdivision_scale) * np.float32(
        desc.dynamic_subdivision_scale)
    ratio_f = np.float32(pixel_uv_area) / target
    if not np.isfinite(ratio_f) or ratio_f < 0:
        ratio = 0
    else:
        ratio = int(ratio_f) & 0xFFFFFFFF
    log2_ratio = _log2_u32(_next_pow2_u32(ratio))
    level = log2_ratio >> 1
    return min(level, desc.max_subdivision_level)


def compute_edge_heuristic(desc: BakeInputDesc, uv_tri: np.ndarray,
                           tex_size) -> int:
    """bake_cpu_impl.cpp:511-528."""
    sizef = np.array(tex_size, dtype=np.float32)
    t = uv_tri.astype(np.float32)
    ve0 = sizef * (t[1] - t[0])
    ve1 = sizef * (t[2] - t[0])
    ve2 = sizef * (t[2] - t[1])
    le = [np.float32(np.dot(v, v)) for v in (ve0, ve1, ve2)]
    e_max = max(le)
    if float(e_max) < 1e-6:
        n = 0.0
    else:
        n = float(np.log2(np.float32(e_max)) / np.float32(2.0)
                  - np.log2(np.float32(desc.dynamic_subdivision_scale)))
    level = int(math.ceil(n))
    return min(max(level, 0), desc.max_subdivision_level)


def get_subdivision_level(desc: BakeInputDesc, opts, i: int,
                          uv_tri: np.ndarray, tex_size) -> int:
    """bake_cpu_impl.cpp:542-560."""
    if desc.subdivision_levels is not None and int(desc.subdivision_levels[i]) <= 12:
        return int(desc.subdivision_levels[i])
    if desc.dynamic_subdivision_scale > 0:
        if bool(geom.is_degenerate(uv_tri)) or opts.enable_edge_heuristic:
            return compute_edge_heuristic(desc, uv_tri, tex_size)
        return compute_area_heuristic(desc, uv_tri, tex_size)
    return desc.max_subdivision_level


# ---------------------------------------------------------------------------
# Options
# ---------------------------------------------------------------------------

@dataclass
class Options:
    """Decoded bake flags (bake_cpu_impl.cpp:61-85)."""

    enable_internal_threads: bool = False
    disable_special_indices: bool = False
    disable_duplicate_detection: bool = False
    enable_near_duplicate_detection: bool = False
    enable_near_duplicate_detection_brute_force: bool = False
    enable_validation: bool = False
    enable_aabb_testing: bool = False
    disable_level_line_intersection: bool = False
    disable_fine_classification: bool = False
    enable_edge_heuristic: bool = False

    @staticmethod
    def from_flags(flags: BakeFlags) -> "Options":
        f = BakeFlags(flags)
        return Options(
            enable_internal_threads=bool(f & BakeFlags.EnableInternalThreads),
            disable_special_indices=bool(f & BakeFlags.DisableSpecialIndices),
            disable_duplicate_detection=bool(f & BakeFlags.DisableDuplicateDetection),
            enable_near_duplicate_detection=bool(f & BakeFlags.EnableNearDuplicateDetection),
            enable_near_duplicate_detection_brute_force=bool(
                f & BakeFlags.EnableNearDuplicateDetectionBruteForce),
            enable_validation=bool(f & BakeFlags.EnableValidation),
            enable_aabb_testing=bool(f & BakeFlags.EnableAABBTesting),
            disable_level_line_intersection=bool(
                f & BakeFlags.DisableLevelLineIntersection),
            disable_fine_classification=bool(
                f & BakeFlags.DisableFineClassification),
            enable_edge_heuristic=bool(f & BakeFlags.EnableEdgeHeuristic),
        )


# ---------------------------------------------------------------------------
# Validation (bake_cpu_impl.cpp:235-290)
# ---------------------------------------------------------------------------

def validate_desc(desc: BakeInputDesc, opts: Options, log=None):
    """ValidateDesc (bake_cpu_impl.cpp:235-290); message strings match the
    reference exactly (they are contract-tested by test_omm_log.cpp)."""
    from .log import Logger, format_name, opacity_state_name
    log = log or Logger()
    if desc.texture is None:
        log.invalid_arg("[Invalid Argument] - texture is not set")
    elif desc.texture.channels != 1:
        # the reference CPU texture object is strictly single-channel
        # (ommCpuTextureFormat = FP32/UNORM8, texture_impl.cpp:40-66);
        # RGBA channel selection is a GPU-dispatch concept
        log.invalid_arg("[Invalid Argument] - texture must be "
                        "single-channel (use Texture.channel_view or the "
                        "GPU baker's alphaTextureChannel)")
    if desc.alpha_mode is None:
        log.invalid_arg("[Invalid Argument] - alphaMode is not set")
    if desc.runtime_sampler.addressing_mode is None:
        log.invalid_arg("[Invalid Argument] - "
                        "runtimeSamplerDesc.addressingMode is not set")
    if desc.runtime_sampler.filter is None:
        log.invalid_arg("[Invalid Argument] - runtimeSamplerDesc.filter "
                        "is not set")
    if desc.tex_coord_format is None:
        log.invalid_arg("[Invalid Argument] - texCoordFormat is not set")
    if desc.tex_coords is None:
        log.invalid_arg("[Invalid Argument] - texCoords is not set")
    if desc.index_format is None:
        log.invalid_arg("[Invalid Argument] - indexFormat is not set")
    if desc.index_buffer is None:
        log.invalid_arg("[Invalid Argument] - indexBuffer is not set")
    if desc.index_count == 0:
        log.invalid_arg("[Invalid Argument] - indexCount is not set")
    if desc.max_subdivision_level > MAX_SUBDIV_LEVEL:
        log.invalid_arg(f"[Invalid Argument] - maxSubdivisionLevel "
                        f"({desc.max_subdivision_level}) is greater than "
                        f"maximum supported ({MAX_SUBDIV_LEVEL})")
    if ((opts.enable_near_duplicate_detection
         or opts.enable_near_duplicate_detection_brute_force)
            and opts.disable_duplicate_detection):
        log.invalid_arg("[Invalid Argument] - EnableNearDuplicateDetection "
                        "or EnableNearDuplicateDetectionBruteForce is used "
                        "together with DisableDuplicateDetection")
    if opts.enable_validation and not log.has_logger():
        log.invalid_arg("[Invalid Argument] - EnableValidation is set but "
                        "no message callback was provided")
    tex: Texture = desc.texture
    if tex.has_alpha_cutoff() and tex.alpha_cutoff != desc.alpha_cutoff:
        log.invalid_arg(f"[Invalid Argument] - Texture object alpha cutoff "
                        f"threshold ({tex.alpha_cutoff:.6f}) is different "
                        f"from alpha cutoff threshold in bake input "
                        f"({desc.alpha_cutoff:.6f})")
    if not is_compatible(desc.alpha_cutoff_greater, desc.format):
        log.invalid_arg(f"[Invalid Argument] - alphaCutoffGreater="
                        f"{opacity_state_name(desc.alpha_cutoff_greater)} is "
                        f"not compatible with {format_name(desc.format)}")
    if not is_compatible(desc.alpha_cutoff_less_equal, desc.format):
        log.invalid_arg(f"[Invalid Argument] - alphaCutoffLessEqual="
                        f"{opacity_state_name(desc.alpha_cutoff_less_equal)} "
                        f"is not compatible with {format_name(desc.format)}")


# ---------------------------------------------------------------------------
# Stage 1: SetupWorkItems (bake_cpu_impl.cpp:589-660)
# ---------------------------------------------------------------------------

DISABLED_PRIMITIVE = 0xE


def setup_work_items(desc: BakeInputDesc, opts: Options,
                     log=None) -> list[WorkItem]:
    tex: Texture = desc.texture
    tris = geom.triangles_from_indices(
        np.asarray(desc.index_buffer)[:desc.index_count], desc.tex_coords,
        desc.tex_coord_format, desc.tex_coord_stride_in_bytes)
    tri_count = desc.index_count // 3
    tris = tris[:tri_count]

    items: list[WorkItem] = []
    key_to_item: dict = {}
    tex_size = tex.size(0)
    num_disabled = 0

    # batched validity scan (identical per-element decisions to the
    # scalar geom calls; the per-tri python loop profiled at ~55 us/tri)
    if tri_count:
        inv_arr = np.asarray(geom.is_invalid(tris)).reshape(tri_count)
        if opts.disable_level_line_intersection:
            inv_arr = inv_arr | np.asarray(
                geom.is_degenerate(tris)).reshape(tri_count)
    # constant subdivision level unless per-tri levels / dynamic scale
    const_subdiv = (desc.subdivision_levels is None
                    and not desc.dynamic_subdivision_scale > 0)

    for i in range(tri_count):
        uv_tri = tris[i]
        subdiv = desc.max_subdivision_level if const_subdiv \
            else get_subdivision_level(desc, opts, i, uv_tri, tex_size)
        disabled = subdiv == DISABLED_PRIMITIVE
        invalid = bool(inv_arr[i])
        if disabled or invalid:
            num_disabled += 1
            continue  # resolved to unresolvedTriState at serialize time
        fmt = desc.format
        if desc.formats is not None and int(desc.formats[i]) != int(Format.INVALID):
            fmt = Format(int(desc.formats[i]))
        key = (uv_tri.tobytes(), subdiv, int(fmt))
        hit = key_to_item.get(key)
        if hit is None or opts.disable_duplicate_detection:
            if subdiv > MAX_SUBDIV_LEVEL:
                raise BakeError(Result.INVALID_ARGUMENT,
                                "subdivisionLevel exceeds kMaxSubdivLevel")
            key_to_item[key] = len(items)
            items.append(WorkItem(subdivision_level=subdiv, vm_format=fmt,
                                  uv_tri=uv_tri, primitive_indices=[i]))
        else:
            items[hit].primitive_indices.append(i)

    if opts.enable_validation and num_disabled != 0 and log is not None:
        from .log import special_index_name
        log.info(f"[Info] - The workload consists of {num_disabled} "
                 f"unclassifiable triangles, these will be classified as "
                 f"unresolvedTriState = "
                 f"{special_index_name(desc.unresolved_tri_state)}.")
    return items


def validate_workload_size(desc: BakeInputDesc, opts: Options,
                           items: list[WorkItem], log=None):
    """bake_cpu_impl.cpp:662-713."""
    limit = desc.max_workload_size != 0xFFFFFFFFFFFFFFFF
    if not opts.enable_validation and not limit:
        return
    tex: Texture = desc.texture
    sizef = np.array(tex.size(0), dtype=np.float32)
    workload = 0
    for it in items:
        s, e = geom.tri_aabb(it.uv_tri)
        aabb = ((e - s) * sizef).astype(np.int32)
        # uint64_t(int32 * int32): int32 wrap then sign-extend to uint64.
        with np.errstate(over="ignore"):
            v = int(np.int32(aabb[0] * aabb[1]))
        workload += v % (1 << 64)
    if limit and workload > desc.max_workload_size:
        raise BakeError(Result.WORKLOAD_TOO_BIG, "workload too big")

    if opts.enable_validation and workload > (1 << 27) and log is not None:
        num_1k = workload >> 20
        log.perf_warn(
            f"[Perf Warning] - The workload consists of {workload} work "
            f"items (number of texels to classify), which corresponds to "
            f"roughly {num_1k} 1024x1024 textures. This is unusually large "
            f"and may result in long bake times.")


# ---------------------------------------------------------------------------
# Stage: special-index promotion (bake_cpu_impl.cpp:1432-1472)
# ---------------------------------------------------------------------------

def promote_special_indices(desc: BakeInputDesc, opts: Options,
                            items: list[WorkItem]):
    for it in items:
        if it.has_special_index():
            continue
        # decide from the fused post cache when present so packed device
        # results never materialize their (4^N,) arrays on this pass
        u = it.post[1] if it.post is not None \
            else native.all_uniform_u8(it.states)
        if u is not None:
            all_equal = u >= 0
            common = int(u) if all_equal else UO
        else:
            st = it.states
            all_equal = bool((st == st[0]).all())
            common = int(st[0])
        if not all_equal and desc.rejection_threshold > 0.0:
            st = it.states
            known = int(np.count_nonzero((st == 0) | (st == 1)))
            if known / float(len(st)) < desc.rejection_threshold:
                all_equal = True
                common = UT
        if all_equal and not opts.disable_special_indices:
            it.special_index = -common - 1


# ---------------------------------------------------------------------------
# Stage: exact dedup (bake_cpu_impl.cpp:1031-1066)
# ---------------------------------------------------------------------------

def deduplicate_exact(opts: Options, items: list[WorkItem]):
    """Merge byte-identical state arrays.  Keyed by the XXH64 digest of
    the 3-state view, exactly like the reference (which dedups on the
    hash alone, bake_cpu_impl.cpp:1031-1066); the native digest fuses
    the UT->UO remap into the hash pass so no 4^N-byte copy is made."""
    if opts.disable_duplicate_detection:
        return
    def _digest(it):
        # the classify engine's fused post pass already hashed fresh
        # rows cache-warm; only mutated/slow-path items re-hash here
        return it.post[0] if it.post is not None \
            else native.states3_digest(it.states)

    ncpu = os.cpu_count() or 1
    todo = sum(1 for it in items if it.post is None)
    if todo > 8 and ncpu > 1 and native.get_lib() is not None:
        # the native digest releases the GIL: hash items in parallel
        # (single-core hosts skip the pool — it is pure overhead there)
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(max_workers=min(ncpu, 8)) as pool:
            digests = list(pool.map(_digest, items))
    else:
        digests = [_digest(it) for it in items]
    digest_to_idx: dict = {}
    for i, it in enumerate(items):
        digest = digests[i]
        if digest is None:  # no native lib: key on the exact bytes
            digest = it.states3().tobytes()
        j = digest_to_idx.get(digest)
        if j is None:
            digest_to_idx[digest] = i
        else:
            items[j].primitive_indices.extend(it.primitive_indices)
            it.primitive_indices = []
            it.special_index = -1


# ---------------------------------------------------------------------------
# Stage: near-duplicate merges (bake_cpu_impl.cpp:1093-1430)
# ---------------------------------------------------------------------------

def _merge_work_items(to: WorkItem, frm: WorkItem):
    """MergeWorkItems (bake_cpu_impl.cpp:1093-1132)."""
    to.primitive_indices.extend(frm.primitive_indices)
    frm.primitive_indices = []
    frm.special_index = -1
    ts = to.states
    fs = frm.states
    diff = ts != fs
    t_known = ts <= 1
    f_known = fs <= 1
    both_known = diff & t_known & f_known
    to_known_from_unknown = diff & t_known & ~f_known
    new = ts.copy()
    new[both_known] = UO
    new[to_known_from_unknown] = fs[to_known_from_unknown]
    to.states = new


def deduplicate_similar_lsh(desc: BakeInputDesc, opts: Options,
                            items: list[WorkItem],
                            iterations: int) -> bool:
    """LSH hamming bit-sampling merge (bake_cpu_impl.cpp:1134-1352);
    reproduces the reference's std::mt19937(42) draw sequence exactly.
    Returns True when any merge mutated states."""
    if opts.disable_duplicate_detection:
        return False
    if (not opts.enable_near_duplicate_detection
            or opts.enable_near_duplicate_detection_brute_force):
        return False
    any_merge = False

    mt = MT19937(42)

    for _attempt in range(iterations):
        for subdiv in range(1, MAX_SUBDIV_LEVEL + 1):
            batch = [i for i, it in enumerate(items)
                     if it.special_index == NO_SPECIAL_INDEX
                     and it.vm_format == Format.OC1_4_State
                     and it.subdivision_level == subdiv]
            if not batch:
                continue

            M = get_num_micro_triangles(subdiv)
            n = len(batch)
            d = M
            r = np.float32(desc.near_duplicate_deduplication_factor) * np.float32(d)
            c = 4.0
            L = int(np.ceil(np.float32(n) ** np.float32(1.0 / c)))
            if L == 0:
                continue
            k = int(np.ceil((np.float32(np.log(np.float32(n))) * np.float32(d))
                            / (np.float32(c) * r)))
            if k == 0:
                continue

            tables = []
            for _t in range(L):
                bit_indices = [mt() & (M - 1) for _ in range(k)]
                tables.append({"bits": bit_indices, "hashes": {},
                               "buckets": {}})

            for wi in batch:
                s3 = items[wi].states3()
                for tab in tables:
                    samples = np.array([s3[b] for b in tab["bits"]],
                                       dtype=np.uint32)
                    h = native.xxh64(samples.tobytes(), seed=42)
                    tab["hashes"][wi] = h
                    tab["buckets"].setdefault(h, []).append(wi)

            for wi in batch:
                it = items[wi]
                if it.has_special_index():
                    continue
                potential: set[int] = set()
                for tab in tables:
                    h = tab["hashes"][wi]
                    for cand in tab["buckets"][h]:
                        if cand == wi:
                            continue
                        if items[cand].has_special_index():
                            continue
                        if len(potential) > 3 * L:
                            break
                        potential.add(cand)
                min_dist = np.inf
                nearest = -1
                from . import native as _native
                s3w = it.states3()
                for cand in sorted(potential):
                    dist = float(_native.hamming_u8(
                        s3w, items[cand].states3()))
                    if dist < float(r) and dist < min_dist:
                        min_dist = dist
                        nearest = cand
                if nearest >= 0:
                    _merge_work_items(it, items[nearest])
                    any_merge = True
    return any_merge


def deduplicate_similar_brute_force(opts: Options,
                                    items: list[WorkItem]) -> bool:
    """bake_cpu_impl.cpp:1354-1430.  Returns True on any merge."""
    if opts.disable_duplicate_detection:
        return False
    if (not opts.enable_near_duplicate_detection
            or not opts.enable_near_duplicate_detection_brute_force):
        return False
    if not items:
        return False

    MERGE_THRESHOLD = 0.1
    MAX_COMPARISONS = 2048
    merged: set[int] = set()
    for a in range(len(items) - 1):
        ia = items[a]
        if ia.special_index != NO_SPECIAL_INDEX:
            continue
        if ia.vm_format != Format.OC1_4_State:
            continue
        start = a + 1
        end = min(MAX_COMPARISONS + start, len(items))
        min_dist = np.inf
        nearest = -1
        for b in range(start, end):
            ib = items[b]
            if ib.special_index != NO_SPECIAL_INDEX:
                continue
            if ib.vm_format != Format.OC1_4_State:
                continue
            if not ib.primitive_indices:
                continue
            if ia.subdivision_level != ib.subdivision_level:
                continue
            if b in merged:
                continue
            from . import native as _native
            M = get_num_micro_triangles(ia.subdivision_level)
            dist = float(_native.hamming_u8(ia.states3(), ib.states3())) / M
            if dist < MERGE_THRESHOLD and dist < min_dist:
                min_dist = dist
                nearest = b
        if nearest >= 0:
            merged.add(a)
            merged.add(nearest)
            _merge_work_items(ia, items[nearest])
    return bool(merged)


# ---------------------------------------------------------------------------
# Stage: memory-budget downsampling (bake_cpu_impl.cpp:1557-1688)
# ---------------------------------------------------------------------------

def _known_ratio(it: WorkItem) -> float:
    s3 = it.states3()
    known = int(np.count_nonzero(s3 <= 1))
    return known / float(len(s3))


def _downsample_known_ratio(it: WorkItem) -> float:
    """DownsampleOneLevel const-variant (bake_cpu_impl.cpp:1531-1555)."""
    s3 = it.states3().reshape(-1, 4)
    ok = (s3[:, 0] <= 1) & (s3[:, 0] == s3[:, 1]) & (s3[:, 0] == s3[:, 2]) \
        & (s3[:, 0] == s3[:, 3])
    return int(np.count_nonzero(ok)) / float(s3.shape[0])


def _downsample_one_level(it: WorkItem):
    """bake_cpu_impl.cpp:1499-1529."""
    if it.subdivision_level == 0:
        raise BakeError(Result.FAILURE, "cannot downsample level 0")
    it.subdivision_level -= 1
    s3 = it.states3().reshape(-1, 4)
    ok = (s3[:, 0] <= 1) & (s3[:, 0] == s3[:, 1]) & (s3[:, 0] == s3[:, 2]) \
        & (s3[:, 0] == s3[:, 3])
    new = np.where(ok, s3[:, 0], np.uint8(UO)).astype(np.uint8)
    it.states = new


def _item_info(desc: BakeInputDesc, it: WorkItem) -> dict:
    """ComputeWorkItemInfo (bake_cpu_impl.cpp:1572-1595)."""
    known = np.float32(_known_ratio(it))
    known_ds = np.float32(_downsample_known_ratio(it))
    area = np.float32(geom.uv_area(it.uv_tri))
    total_area = np.float32(0.0)
    for _ in it.primitive_indices:
        total_area = np.float32(total_area + area)
    mem = max(1, (get_num_micro_triangles(it.subdivision_level) * 2) // 8)
    mem_ds = max(1, (get_num_micro_triangles(it.subdivision_level - 1) * 2) // 8)
    delta = mem - mem_ds
    cov_delta = np.float32(known - known_ds)
    # delta==0 at level 1 (both byte sizes clamp to 1); the reference's C++
    # float division yields inf/nan silently — keep IEEE semantics, no warn.
    with np.errstate(divide="ignore", invalid="ignore"):
        cpb = float(np.float32(total_area * cov_delta) / np.float32(delta))
    return {"mem": mem, "mem_ds": mem_ds, "cpb": cpb}


def compress(desc: BakeInputDesc, opts: Options,
             items: list[WorkItem]) -> bool:
    """Returns True when any item was downsampled (states mutated)."""
    if desc.max_array_data_size == 0xFFFFFFFF:
        return False
    active = []
    for i, it in enumerate(items):
        if it.subdivision_level == 0 or not it.primitive_indices \
                or it.has_special_index():
            continue
        active.append([i, _item_info(desc, it)])

    total = sum(a[1]["mem"] for a in active)
    if total < desc.max_array_data_size:
        return False

    active.sort(key=lambda a: a[1]["cpb"])
    while total >= desc.max_array_data_size and active:
        n = len(active)
        i = 0
        while i < n:
            idx = active[i][0]
            it = items[idx]
            total -= active[i][1]["mem"]
            _downsample_one_level(it)
            total += active[i][1]["mem_ds"]
            if it.subdivision_level == 0:
                active[i][0] = -1
                i += 1
                continue
            active[i][1] = _item_info(desc, it)
            if total < desc.max_array_data_size:
                break
            if i + 1 != n and active[i][1]["cpb"] < active[i + 1][1]["cpb"]:
                continue  # redo same item (i-- then i++ in the reference)
            i += 1
        # swap-remove dead entries then resort (bake_cpu_impl.cpp:1668-1684)
        j = 0
        while j < len(active):
            if active[j][0] == -1:
                active[j], active[-1] = active[-1], active[j]
                active.pop()
            else:
                j += 1
        active.sort(key=lambda a: a[1]["cpb"])
    return True


# ---------------------------------------------------------------------------
# Stages: histograms, spatial sort, serialize (bake_cpu_impl.cpp:1690-1920)
# ---------------------------------------------------------------------------

def create_usage_histograms(items: list[WorkItem]):
    arr = np.zeros((3, MAX_NUM_SUBDIV_LEVELS), dtype=np.uint64)
    idxh = np.zeros((3, MAX_NUM_SUBDIV_LEVELS), dtype=np.uint64)
    for it in items:
        if it.special_index == NO_SPECIAL_INDEX:
            arr[int(it.vm_format) - 1, it.subdivision_level] += 1
            idxh[int(it.vm_format) - 1, it.subdivision_level] += len(
                it.primitive_indices)
    return arr, idxh


def micromap_spatial_sort(items: list[WorkItem]) -> list[int]:
    """bake_cpu_impl.cpp:1707-1754: descending (key, index) order;
    special-index items first, regular items by (subdiv, morton) desc.
    One batched centroid->morton pass (same fp32 op order per element
    as the scalar form) instead of a per-item python loop."""
    n = len(items)
    if n == 0:
        return []
    keys = np.empty(n, np.uint64)
    spec = np.fromiter((it.special_index != NO_SPECIAL_INDEX
                        for it in items), bool, n)
    sidx = np.flatnonzero(spec)
    keys[sidx] = (np.uint64(1) << np.uint64(63)) | sidx.astype(np.uint64)
    reg = np.flatnonzero(~spec)
    if reg.size:
        K = 13
        q_size = np.array([1 << K, 1 << K], dtype=np.int32)
        t = np.stack([items[i].uv_tri for i in reg]).astype(np.float32)
        centroid = (t[:, 0] + t[:, 1] + t[:, 2]) / np.float32(3.0)
        q_uv = (q_size.astype(np.float32) * centroid).astype(np.int32)
        q_pos = get_tex_coord(TextureAddressMode.MirrorOnce, q_uv,
                              q_size, np.array([0, 0], np.int32), False)
        mcode = xy_to_morton(q_pos[:, 0].astype(np.uint32),
                             q_pos[:, 1].astype(np.uint32))
        lev = np.fromiter((items[i].subdivision_level for i in reg),
                          np.uint64, reg.size)
        keys[reg] = (lev << np.uint64(60)) | mcode.astype(np.uint64)
    # ascending lexsort by (key, index), reversed == the reference's
    # descending (key, index) tuple sort
    order = np.lexsort((np.arange(n), keys))[::-1]
    return [int(i) for i in order]


def pack_states(states: np.ndarray, fmt: Format) -> np.ndarray:
    """Bit-pack a (M,) state array into OC1 bytes
    (bake_cpu_impl.cpp:1802-1819); native C++ fast path."""
    from . import native
    bits = 1 if fmt == Format.OC1_2_State else 2
    return native.pack_states(states, bits)


def serialize_result(desc: BakeInputDesc, items: list[WorkItem],
                     arr_hist: np.ndarray, idx_hist: np.ndarray,
                     order: list[int], allocator=None,
                     spec_blob=None) -> BakeResult:
    """bake_cpu_impl.cpp:1756-1920.  Output buffers go through the
    user allocator when one is supplied (std_allocator.h analog).

    spec_blob: the speculative result blob (_speculative_blob_plan) —
    used as array_data directly when the speculative layout held (every
    non-special item still sits at its pre-classification offset with
    an unchanged level/format), in which case rows the packed-direct
    replay wrote in place are not copied again."""
    from .allocator import check_and_set_default
    allocator = check_and_set_default(allocator)
    bit_count = get_bit_count(desc.format)

    desc_count = 0
    array_size = 0
    for lvl in range(MAX_NUM_SUBDIV_LEVELS):
        cnt = int(arr_hist[int(desc.format) - 1, lvl])
        desc_count += cnt
        nbits = get_num_micro_triangles(lvl) * bit_count
        array_size += cnt * max(nbits >> 3, 1)
    if array_size > 0xFFFFFFFF:
        raise BakeError(Result.FAILURE, "array data > 4GB")

    use_spec = False
    if spec_blob is not None and desc_count and len(spec_blob) == array_size:
        off = 0
        ok = True
        for vm_index in order:
            it = items[vm_index]
            if it.special_index != NO_SPECIAL_INDEX:
                continue
            if (it.__dict__.get("_spec_offset") != off
                    or it.vm_format != Format.OC1_4_State):
                ok = False
                break
            M = get_num_micro_triangles(it.subdivision_level)
            off += max((M * 2) >> 3, 1)
        use_spec = ok and off == array_size
    array_data = spec_blob if use_spec \
        else allocator.array(array_size, np.uint8)
    if spec_blob is not None and not use_spec:
        # a user allocator's free callback may release the memory while
        # the copy loop below (or any later consumer) still reads the
        # in-blob PackedStates views — detach them first.  The default
        # free is a no-op and numpy views keep the base buffer alive,
        # so the common miss (any promotion/merge) costs no extra copy.
        detach = allocator._free is not None
        for it in items:
            pk = it.packed2()
            if pk is not None and pk.blob_offset is not None:
                if detach:
                    pk.packed = pk.packed.copy()
                pk.blob_offset = None
        allocator.free(spec_blob)
    desc_array: list[MicromapDesc] = []
    if desc_count != 0:
        offset = 0
        pack_plan: list = []
        for vm_index in order:
            it = items[vm_index]
            if it.special_index != NO_SPECIAL_INDEX:
                continue
            if offset >= array_size:
                raise BakeError(Result.FAILURE, "array data overflow")
            desc_array.append(MicromapDesc(offset=offset,
                                           subdivision_level=it.subdivision_level,
                                           format=int(it.vm_format)))
            it.desc_offset = len(desc_array) - 1
            M = get_num_micro_triangles(it.subdivision_level)
            stride = max((M * bit_count) >> 3, 1)
            bits = 1 if it.vm_format == Format.OC1_2_State else 2
            pk = it.packed2()
            if pk is not None and bits == 2 and len(pk.packed) == stride:
                if use_spec and pk.blob_offset == offset:
                    # the replay already wrote this row in place
                    offset += stride
                    continue
                # device engine already produced the blob bytes
                # (PackedStates rows ARE the OC1_4_State layout)
                array_data[offset:offset + stride] = pk.packed
                offset += stride
                continue
            # collect, then pack the whole blob in ONE native call;
            # packed length always equals the stride (M is a power of 4)
            st = np.ascontiguousarray(it.states, dtype=np.uint8)
            if use_spec:
                # the replay may have direct-written this region before
                # the item's states changed; the packers OR into their
                # destination, so clear it first
                array_data[offset:offset + stride] = 0
            pack_plan.append((st, bits, offset, stride))
            offset += stride
        if not native.pack_states_batch(
                [p[0] for p in pack_plan], [p[1] for p in pack_plan],
                [p[2] for p in pack_plan], array_data):
            for st, bits, off, stride in pack_plan:
                if not native.pack_states_into(
                        st, bits, array_data[off:off + stride]):
                    packed = native.pack_states(st, bits)
                    array_data[off:off + len(packed)] |= packed

    def hist_list(h):
        out = []
        for fmt in (Format.OC1_2_State, Format.OC1_4_State):
            for lvl in range(MAX_NUM_SUBDIV_LEVELS):
                cnt = int(h[int(fmt) - 1, lvl])
                if cnt:
                    out.append(UsageCount(count=cnt, subdivision_level=lvl,
                                          format=int(fmt)))
        return out

    tri_count = desc.index_count // 3
    index_buffer = np.full(tri_count, int(desc.unresolved_tri_state),
                           dtype=np.int32)
    for it in items:
        for prim in it.primitive_indices:
            if it.special_index != NO_SPECIAL_INDEX:
                index_buffer[prim] = it.special_index
            else:
                # desc_offset is uint32 (0xFFFFFFFF when never assigned,
                # possible with mixed per-triangle formats — the reference
                # stores it into the int32 buffer with wraparound).
                v = it.desc_offset
                index_buffer[prim] = v - (1 << 32) if v >= (1 << 31) else v

    flags = BakeFlags(desc.bake_flags)
    allow8 = bool(flags & BakeFlags.Allow8BitIndices)
    force32 = bool(flags & BakeFlags.Force32BitIndices)
    if allow8 and tri_count <= 127 and not force32:
        fmt = IndexFormat.UINT_8
    elif tri_count <= 32767 and not force32:
        fmt = IndexFormat.UINT_16
    else:
        fmt = IndexFormat.UINT_32

    tri_area = np.zeros(tri_count, dtype=np.float32)
    tris = geom.triangles_from_indices(
        np.asarray(desc.index_buffer)[:desc.index_count], desc.tex_coords,
        desc.tex_coord_format, desc.tex_coord_stride_in_bytes)
    areas = np.asarray(geom.uv_area(tris), np.float32).reshape(-1) \
        if tri_count else np.zeros(0, np.float32)  # one batched pass
    for it in items:
        for prim in it.primitive_indices:
            tri_area[prim] = areas[prim]

    return BakeResult(array_data=array_data, desc_array=desc_array,
                      desc_array_histogram=hist_list(arr_hist),
                      index_buffer=index_buffer, index_format=fmt,
                      index_histogram=hist_list(idx_hist),
                      triangle_area=tri_area)


# ---------------------------------------------------------------------------
# Top-level bake
# ---------------------------------------------------------------------------

def _speculative_blob_plan(desc: BakeInputDesc, opts: Options,
                           items: list[WorkItem], allocator):
    """Speculative serialize layout, computed BEFORE classification:
    the morton sort keys depend only on each item's UV centroid and
    subdivision level (micromap_spatial_sort; bake_cpu_impl.cpp:
    1707-1754), so the final blob's per-item offsets are known up front
    whenever no item later gets a special index, merges, or changes
    level/format.  The packed-direct replay then writes rows straight
    into the final result blob (zero serialize-stage copies);
    serialize_result validates the speculation and falls back to the
    copy path when classification outcomes changed the layout.

    Returns the allocated blob (items gain `_spec_offset`) or None when
    the descriptor can't speculate (non-OC1_4 formats)."""
    if desc.format != Format.OC1_4_State or not items:
        return None
    if any(it.vm_format != Format.OC1_4_State or it.has_special_index()
           for it in items):
        return None
    order = micromap_spatial_sort(items)
    off = 0
    for vm_index in order:
        it = items[vm_index]
        it.__dict__["_spec_offset"] = off
        M = get_num_micro_triangles(it.subdivision_level)
        off += max((M * 2) >> 3, 1)
    if off == 0 or off > 0xFFFFFFFF:
        return None
    from .allocator import check_and_set_default
    return check_and_set_default(allocator).array(off, np.uint8)


def bake(desc: BakeInputDesc, backend: str = "numpy",
         logger=None, allocator=None, mesh=None) -> BakeResult:
    """Full CPU-parity bake (BakeImpl, bake_cpu_impl.cpp:1923-1985).

    backend: 'numpy' (oracle), 'jax' (jit on default device), or 'pallas'
    (TPU kernel for the classification hot loop).
    logger: optional omm_tpu.log.Logger routing validation messages to a
    user message callback.
    mesh: optional jax.sharding.Mesh — classification of eligible work
    items shards over the mesh's devices (the whole two-phase pipeline
    under shard_map, parallel/shard.py); ineligible items fall back to
    the single-device flow.  Results are bit-identical with and without
    a mesh.
    """
    from .log import Logger
    log = logger or Logger()
    mark = _bake_trace()
    opts = Options.from_flags(desc.bake_flags)
    if desc.texture is None:
        log.invalid_arg("[Invalid Argument] - ommCpuBakeInputDesc has no "
                        "texture set")
    validate_desc(desc, opts, log)
    mark("validate")

    items = setup_work_items(desc, opts, log)
    validate_workload_size(desc, opts, items, log)
    # the packed-direct device replay can write rows straight into the
    # final result blob when the serialize layout is known up front
    spec_blob = (_speculative_blob_plan(desc, opts, items, allocator)
                 if backend in ("pallas", "auto") else None)
    mark("setup")

    classify_items(desc, opts, items, backend=backend, mesh=mesh,
                   spec_blob=spec_blob)
    mark("classify")
    res = finalize_items(desc, opts, items, allocator=allocator,
                         spec_blob=spec_blob)
    mark("finalize")
    return res


def classify_items(desc: BakeInputDesc, opts: Options,
                   items: list[WorkItem], backend: str = "numpy",
                   mesh=None, sel=None, spec_blob=None) -> None:
    """The classification half of bake() (coarse + fine/device passes),
    mutating `items` in place.  `sel` optionally restricts classification
    to a subset of items (bool mask over `items`) — the exact bake farm
    classifies only the work items its process owns and gathers states
    over DCN (parallel/multihost.py); per-item results are independent of
    batch composition (the bit-exactness contract), so a subset classify
    is byte-identical to the same items' states in a whole-list run."""
    mark = _bake_trace()
    tex: Texture = desc.texture
    if sel is None:
        sel = np.ones(len(items), bool)

    cfg = engine.ResampleConfig(
        addr_mode=desc.runtime_sampler.addressing_mode,
        filter=desc.runtime_sampler.filter,
        alpha_cutoff=desc.alpha_cutoff,
        border_alpha=desc.runtime_sampler.border_alpha,
        fmt=desc.format,
        promotion=desc.unknown_state_promotion,
        cutoff_gt=desc.alpha_cutoff_greater,
        cutoff_le=desc.alpha_cutoff_less_equal,
        disable_level_line=opts.disable_level_line_intersection,
        enable_aabb_testing=opts.enable_aabb_testing,
        disable_fine=opts.disable_fine_classification,
    )
    if opts.enable_aabb_testing and not opts.disable_level_line_intersection:
        raise BakeError(Result.INVALID_ARGUMENT,
                        "EnableAABBTesting requires DisableLevelLineIntersection")

    if backend == "auto":
        # Route by workload size: the device pipeline amortizes its host
        # round-trips and jit compiles over millions of micro-triangles
        # (the reference makes the same CPU-vs-GPU-baker tradeoff,
        # docs/integration_guide.md:110); small deduplicated bakes are
        # faster on the host oracle.
        total_utri = sum(get_num_micro_triangles(it.subdivision_level)
                         for i, it in enumerate(items) if sel[i])
        backend = "pallas" if total_utri >= (1 << 22) else "numpy"

    if backend == "numpy":
        xp = np
        classify = None
    elif backend == "jax":
        from .kernels.jax_classify import classify_work_item_device
        xp = np
        classify = classify_work_item_device
    elif backend == "pallas":
        from .kernels.pallas_classify import classify_work_item_pallas
        xp = np
        classify = classify_work_item_pallas
    else:
        raise ValueError(f"unknown backend {backend}")

    # one batched degeneracy scan (identical per-element fp32 decisions;
    # the scalar call costs ~12 us x several sites per item)
    degen_all = (np.asarray(geom.is_degenerate(
        np.stack([it.uv_tri for it in items]))).reshape(len(items))
        if items else np.zeros(0, bool))

    # Multi-chip: shard eligible FRESH work items over the mesh before the
    # coarse pass (the sharded pipeline's phase-1 descent IS the coarse
    # resolve, so skipping SAT coarse for these items changes nothing —
    # both resolve only provably-one-sided regions; the exact kernel
    # settles the rest).  Ineligible items continue single-device.
    sharded_done: set[int] = set()
    if (mesh is not None and backend in ("jax", "pallas")
            and not cfg.disable_fine and not cfg.disable_level_line
            and cfg.filter == TextureFilterMode.Linear):
        from .kernels import twophase as _tp
        from .parallel.shard import sharded_classify_batch
        UOv = int(OpacityState.UnknownOpaque)
        by_level: dict[int, list[int]] = {}
        for i, it in enumerate(items):
            if (sel[i] and not degen_all[i]
                    and (getattr(it, "_fresh", False)
                         or int(it.states.min()) == UOv)):
                by_level.setdefault(it.subdivision_level, []).append(i)
        n_dev = int(mesh.devices.size)
        for level, idxs in by_level.items():
            lg = _tp._group_level(tex, [items[i].uv_tri for i in idxs],
                                  level)
            ok = [i for i in idxs
                  if _tp._fast_path_ok(tex, cfg, items[i].uv_tri, level,
                                       lg)
                  and bool(geom.winding_stable(items[i].uv_tri, level))]
            if not ok:
                continue
            padded = ok + ok[:1] * ((-len(ok)) % n_dev)  # pad to mesh multiple
            outs, _ = sharded_classify_batch(
                mesh, tex, cfg,
                [(items[i].uv_tri, items[i].states) for i in padded], level)
            for i, st in zip(ok, outs[:len(ok)]):
                items[i].states = st
                sharded_done.add(i)

    mark("  cls:prep")
    for i, it in enumerate(items):
        if i in sharded_done or not sel[i]:
            continue
        st = engine.resample_coarse_item(tex, cfg, it.uv_tri,
                                         it.subdivision_level, it.states)
        if st is not it.states:  # identity (no SAT): keep _fresh valid
            it.states = st
    mark("  cls:coarse")

    def _device_eligible(i, it):
        return (classify is not None and not cfg.disable_fine
                and not degen_all[i]
                and cfg.filter == TextureFilterMode.Linear
                and not cfg.disable_level_line)

    if backend in ("jax", "pallas") and \
            cfg.filter == TextureFilterMode.Nearest \
            and not cfg.disable_fine:
        # Nearest-filter fast path: the phase-1 window resolve settles the
        # off-contour bulk on device; survivors stay UnknownOpaque for the
        # exact host pass below (kernels/twophase.resolve_nearest_phase1).
        from .kernels.twophase import resolve_nearest_phase1
        by_level: dict[int, list[int]] = {}
        for i, it in enumerate(items):
            if sel[i] and not degen_all[i]:
                by_level.setdefault(it.subdivision_level, []).append(i)
        for level, idxs in by_level.items():
            res = resolve_nearest_phase1(
                tex, cfg, [(items[i].uv_tri, items[i].states) for i in idxs],
                level)
            if res is not None:
                for i, st in zip(idxs, res):
                    items[i].states = st

    device_done: set[int] = set()
    if backend == "pallas":
        # Batch all device-eligible work items per subdivision level
        # through the hierarchical two-phase engine (one device pipeline,
        # two syncs per batch — kernels/twophase.py).
        from .kernels.twophase import classify_work_items_batches
        by_level: dict[int, list[int]] = {}
        for i, it in enumerate(items):
            if sel[i] and _device_eligible(i, it) and i not in sharded_done:
                by_level.setdefault(it.subdivision_level, []).append(i)
        # Bound device memory per batch (the maxScratchMemorySize analog:
        # the reference splits the GPU bake into batches when micro-tri
        # scratch exceeds the budget, bake_gpu_impl.cpp:517-584) and hand
        # the batch list to the pipelined engine so result fetches overlap
        # later batches' device execution.
        MAX_UTRI_PER_BATCH = 3 << 22  # ~12M micro-tris of device scratch
        # (finer batches pipeline better on a tunnel-attached chip: the
        # enqueue-ahead chain hides fetch+reconstruct under device time)
        # OMM_BAKE_SUBBATCH overrides items-per-batch: a remote jit
        # compile costs minutes per distinct batch size, so callers that
        # already warmed one size (bench.py) pin it.  A comma list
        # ("128,96,32") is a tail-light schedule: the head size repeats,
        # then the tail sizes shrink the LAST batches — the final
        # payload fetch + reconstruction are the pipeline's
        # non-overlapped tail, so a small last batch trims it
        sub_env = os.environ.get("OMM_BAKE_SUBBATCH", "0")
        schedule = [int(s) for s in sub_env.split(",") if int(s or 0) > 0]
        from .kernels.twophase import PackedStates
        # ONE pipelined call across ALL levels (largest level first so
        # the non-overlapped fetch/replay tail is the smallest work):
        # every level's chains enqueue before any fetch drains — the
        # reference's per-level indirect dispatches share one command
        # stream the same way (bake_gpu_impl.cpp:992-996)
        chunks: list = []
        levels_per_chunk: list[int] = []
        for level in sorted(by_level, reverse=True):
            per_item = get_num_micro_triangles(level)
            cs = split_tail_light(
                by_level[level], schedule or
                [max(1, MAX_UTRI_PER_BATCH // per_item)])
            chunks.extend(cs)
            levels_per_chunk.extend([level] * len(cs))
        if chunks:
            batches = [[(items[i].uv_tri,
                         None if getattr(items[i], "_fresh", False)
                         else items[i].states) for i in c]
                       for c in chunks]
            posts: list = []
            sink = None
            if spec_blob is not None:
                # speculative-serialize sink: each batch item's final
                # blob offset (rows land in place; see
                # _speculative_blob_plan)
                dsts = [np.asarray(
                    [items[i].__dict__.get("_spec_offset", -1)
                     for i in c], np.int64) if lvl >= 1 else None
                    for c, lvl in zip(chunks, levels_per_chunk)]
                sink = (spec_blob, dsts)
            outs = classify_work_items_batches(tex, cfg, batches,
                                               levels_per_chunk,
                                               post_out=posts,
                                               packed_out=True,
                                               packed_sink=sink)
            for c, res, pd in zip(chunks, outs, posts):
                for bi, (i, st) in enumerate(zip(c, res)):
                    if isinstance(st, PackedStates):
                        # serialize-ready rows; the (M,) array stays
                        # unmaterialized unless someone reads .states
                        items[i].set_packed_states(st, pd.get(bi))
                    else:
                        items[i].states = st
                        items[i].post = pd.get(bi)
                    device_done.add(i)
        mark("  cls:pipeline")

    sharded_items = {id(items[i]) for i in sharded_done}

    def _fine(i, it):
        if id(it) in sharded_items:
            return it.states  # classified by the sharded pipeline
        if _device_eligible(i, it):
            return classify(tex, cfg, it.uv_tri, it.subdivision_level,
                            it.states)
        if (backend in ("jax", "pallas") and not cfg.disable_fine
                and cfg.filter == TextureFilterMode.Linear
                and not cfg.disable_level_line
                and bool(degen_all[i])):
            # degenerate (line) triangles: host DDA schedule, exact
            # level-line kernel on device (bake_cpu_impl.cpp:896-904)
            from .kernels.jax_classify import classify_degenerate_device
            return classify_degenerate_device(
                tex, cfg, it.uv_tri, it.subdivision_level, it.states)
        if (backend in ("jax", "pallas") and not cfg.disable_fine
                and cfg.filter == TextureFilterMode.Nearest
                and not bool(degen_all[i])):
            # nearest-filter survivors (the contour left by the phase-1
            # window resolve) classify on device too
            from .kernels.jax_classify import classify_nearest_survivors
            return classify_nearest_survivors(
                tex, cfg, it.uv_tri, it.subdivision_level, it.states)
        return engine.resample_fine_item(tex, cfg, it.uv_tri,
                                         it.subdivision_level, it.states,
                                         xp=xp)

    # EnableInternalThreads analog (the reference's OpenMP work-item loop,
    # bake_cpu_impl.cpp:735,833): thread over work items on the host
    # backend — the vectorized numpy stages release the GIL.
    # Items already classified by the batched device engine are skipped
    # WITHOUT reading .states (a read would materialize packed results).
    mine = [i for i in range(len(items)) if sel[i] and i not in device_done]
    if (opts.enable_internal_threads and backend == "numpy"
            and len(mine) > 1):
        import concurrent.futures as cf
        import os as _os
        with cf.ThreadPoolExecutor(
                max_workers=min(_os.cpu_count() or 4, 16)) as pool:
            for i, st in zip(mine, pool.map(_fine, mine,
                                            [items[i] for i in mine])):
                if st is not items[i].states:  # identity keeps post cache
                    items[i].states = st
    else:
        for i in mine:
            st = _fine(i, items[i])
            if st is not items[i].states:  # identity keeps the post cache
                items[i].states = st
    mark("  cls:fine")


def finalize_items(desc: BakeInputDesc, opts: Options,
                   items: list[WorkItem], allocator=None,
                   spec_blob=None) -> BakeResult:
    """The global tail of bake() — promotion, dedup (exact + near-dup),
    compression, histograms, spatial sort, serialization.  These stages
    couple across ALL work items (dedup maps, the compress budget sort),
    so the exact bake farm replays this tail once over the gathered
    global item list (parallel/multihost.merge_exact)."""
    mark = _bake_trace()
    promote_special_indices(desc, opts, items)
    deduplicate_exact(opts, items)
    mark("  promote+dedup")
    changed = deduplicate_similar_lsh(desc, opts, items, iterations=3)
    changed |= deduplicate_similar_brute_force(opts, items)
    promote_special_indices(desc, opts, items)
    changed |= compress(desc, opts, items)
    if changed:
        # only near-duplicate merges or downsampling can mint new exact
        # duplicates / uniform items; when none ran, the second dedup +
        # promotion passes are identities (the reference runs them
        # unconditionally, but they observably do nothing then)
        deduplicate_exact(opts, items)
        promote_special_indices(desc, opts, items)
    mark("  lsh+compress")

    arr_hist, idx_hist = create_usage_histograms(items)
    order = micromap_spatial_sort(items)
    mark("  hist+morton")
    res = serialize_result(desc, items, arr_hist, idx_hist, order,
                           allocator=allocator, spec_blob=spec_blob)
    mark("  serialize")
    return res
