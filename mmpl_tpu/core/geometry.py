"""Token/frame geometry and the macro-from-micro (MMPL) chunk plans.

Everything in this module is *static* Python data: the MMPL denoising plan
(which frames are denoised in which chunk-group, which KV-cache slots they
occupy, and which cached frames each group may attend to) is a pure function
of the plan constants.  The reference computes these sets dynamically with
Python list manipulation on GPU-resident caches
(`MMPL_t2v/wan/modules/causal_fps_model.py:193-264`,
`MMPL_t2v/pipeline/casual_fps_inference.py:250-334`); here we precompute one
static `GroupSchedule` per chunk-group so every group lowers to a single XLA
program with static gather/scatter indices.

Reference constants:
  - 1560 tokens / latent frame = (60/2) * (104/2)    (casual_fps_inference.py:82)
  - 21 latent frames / window = 32760 tokens          (utils/wan_wrapper.py:144)
  - KV cache = 32760 - 6*1560 = 23400 tokens = 15 frame slots
    (casual_fps_inference.py:461)
  - t2v plan  clean_steps=[0,0,1,1,2,2,2,2,2,2,1,1,1,3,3,3,3,3,3,1,1],
    groups [2,7,6,6]                                  (casual_fps_inference.py:250-252)
  - i2v plan  clean_steps=[0,1,2,2,3,3,3,3,3,3,2,2,2,4,4,4,4,4,4,2,2],
    groups [1,1,7,6,6]            (MMPL_i2v/pipeline/casual_fps_inference.py:253-255)
  - frames >= 19 are stored at cache slot (frame - 6) (causal_fps_model.py:220-246)
  - a group containing frame 15 runs in "append" mode: its KV is never
    written to the cache; it attends to visible cache + its own keys
    (causal_fps_model.py:209,254-264)
  - t2v pipeline removes frames {19,20} from the visible set before fill
    group 2 and re-adds them before fill group 3
    (casual_fps_inference.py:281-326)
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

# ---------------------------------------------------------------------------
# Window geometry
# ---------------------------------------------------------------------------

#: VAE spatio-temporal stride (t, h, w) — wan/configs/wan_t2v_14B.py:17
VAE_STRIDE = (4, 8, 8)
#: DiT patch size (t, h, w) — wan/configs/wan_t2v_14B.py:20
PATCH_SIZE = (1, 2, 2)
#: canonical window length in latent frames — utils/wan_wrapper.py:144
WINDOW_FRAMES = 21
#: number of latent frames whose KV is never cached (15,16,17,18 in t2v/i2v)
UNCACHED_FRAMES = 6
#: frame index at/above which cached frames are remapped down by 6 slots
REMAP_FRAME = 19
#: frame whose presence in a group triggers append (no-cache-write) mode
APPEND_TRIGGER_FRAME = 15


def tokens_per_frame(height: int = 480, width: int = 832,
                     vae_stride: Tuple[int, int, int] = VAE_STRIDE,
                     patch_size: Tuple[int, int, int] = PATCH_SIZE) -> int:
    """Tokens per latent frame. 480x832 -> (480/8/2)*(832/8/2) = 30*52 = 1560."""
    lat_h = height // vae_stride[1]
    lat_w = width // vae_stride[2]
    assert lat_h % patch_size[1] == 0 and lat_w % patch_size[2] == 0
    return (lat_h // patch_size[1]) * (lat_w // patch_size[2])


#: canonical 480x832 value used throughout the reference
TOKENS_PER_FRAME = tokens_per_frame()            # 1560
#: canonical full-window token count
WINDOW_TOKENS = WINDOW_FRAMES * TOKENS_PER_FRAME  # 32760
#: canonical KV-cache capacity in frame slots
KV_CACHE_SLOTS = WINDOW_FRAMES - UNCACHED_FRAMES  # 15


def latent_grid(height: int = 480, width: int = 832) -> Tuple[int, int]:
    """(rows, cols) of the token grid per frame: (30, 52) at 480x832."""
    return (height // VAE_STRIDE[1] // PATCH_SIZE[1],
            width // VAE_STRIDE[2] // PATCH_SIZE[2])


def pixel_frames(num_latent_frames: int) -> int:
    """Latent frames -> pixel frames under the causal VAE: 21 -> 81."""
    return (num_latent_frames - 1) * VAE_STRIDE[0] + 1


def latent_frames(num_pixel_frames: int) -> int:
    assert (num_pixel_frames - 1) % VAE_STRIDE[0] == 0
    return (num_pixel_frames - 1) // VAE_STRIDE[0] + 1


# ---------------------------------------------------------------------------
# Plans
# ---------------------------------------------------------------------------

#: which chunk-group denoises each of the 21 window frames (t2v)
T2V_CLEAN_STEPS: Tuple[int, ...] = (
    0, 0, 1, 1, 2, 2, 2, 2, 2, 2, 1, 1, 1, 3, 3, 3, 3, 3, 3, 1, 1)
#: i2v variant: first frame gets its own group
I2V_CLEAN_STEPS: Tuple[int, ...] = (
    0, 1, 2, 2, 3, 3, 3, 3, 3, 3, 2, 2, 2, 4, 4, 4, 4, 4, 4, 2, 2)


def cache_slot(frame: int) -> int:
    """KV-cache slot of a window frame (causal_fps_model.py:220,229-246)."""
    if frame >= REMAP_FRAME:
        return frame - UNCACHED_FRAMES
    if frame >= APPEND_TRIGGER_FRAME:
        raise ValueError(f"frame {frame} is never cached")
    return frame


def groups_from_clean_steps(clean_steps: Sequence[int]) -> List[List[int]]:
    """Partition frame indices by group id (casual_fps_inference.py:252)."""
    num_groups = max(clean_steps) + 1
    return [[i for i, v in enumerate(clean_steps) if v == g]
            for g in range(num_groups)]


@dataclasses.dataclass(frozen=True)
class GroupSchedule:
    """Fully-static schedule for one chunk-group of the MMPL plan.

    Attributes:
      index: group id.
      frames: window-frame indices denoised by this group, ascending.
      append_mode: True if this group's KV is never written to the cache
        (the reference's `15*1560 in current_start` branch,
        causal_fps_model.py:254-264); queries attend to
        `visible_slots` cache frames plus the group's own in-flight keys.
      write_slots: cache slot per frame in `frames` (empty when append_mode).
      visible_frames: window-frame indices of cached frames this group's
        queries attend to *after* this group's own KV write, ascending.
        (Attention is permutation-invariant over KV so ordering is free; the
        reference materialises an arbitrary-order Python set.)
      visible_slots: cache slots of `visible_frames`.
      anchor_group: True for the group whose completion triggers the
        anchor handoff to the next pipeline stage
        (casual_fps_inference.py:380-383).
      reseed: pairs (group_frame_pos, source_output_frame) whose initial
        latent is re-noised from an already-denoised output frame before
        this group starts (casual_fps_inference.py:283-318). Empty for i2v.
    """
    index: int
    frames: Tuple[int, ...]
    append_mode: bool
    write_slots: Tuple[int, ...]
    visible_frames: Tuple[int, ...]
    visible_slots: Tuple[int, ...]
    anchor_group: bool
    reseed: Tuple[Tuple[int, int], ...] = ()

    @property
    def num_frames(self) -> int:
        return len(self.frames)

    @property
    def num_visible(self) -> int:
        return len(self.visible_frames)


@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    """The complete static MMPL window plan (t2v or i2v)."""
    name: str
    clean_steps: Tuple[int, ...]
    groups: Tuple[GroupSchedule, ...]
    #: index of the group whose completion releases the anchors
    anchor_group_index: int
    #: frames saved at the handoff point, as output-frame indices
    handoff_frames: Tuple[int, ...]

    @property
    def num_frames(self) -> int:
        return len(self.clean_steps)

    @property
    def group_sizes(self) -> Tuple[int, ...]:
        return tuple(g.num_frames for g in self.groups)


def _build_plan(name: str, clean_steps: Sequence[int], anchor_group: int,
                handoff_frames: Sequence[int],
                vis_toggles: dict, reseeds: dict) -> ChunkPlan:
    """Replay the reference's visibility-set evolution statically.

    vis_toggles: {group_index: ('remove'|'add', frames)} applied to the
      visible set immediately before that group runs.
    reseeds: {group_index: ((pos_in_group, source_frame), ...)}.
    """
    groups = groups_from_clean_steps(clean_steps)
    visible: set = set()
    schedules = []
    for gi, frames in enumerate(groups):
        if gi in vis_toggles:
            op, toggled = vis_toggles[gi]
            if op == "remove":
                visible -= set(toggled)
            else:
                visible |= set(toggled)
        append_mode = APPEND_TRIGGER_FRAME in frames
        if append_mode:
            write_slots: Tuple[int, ...] = ()
            # visible set is NOT extended (causal_fps_model.py:254-258)
            vis_now = tuple(sorted(visible))
        else:
            write_slots = tuple(cache_slot(f) for f in frames)
            visible |= set(frames)
            vis_now = tuple(sorted(visible))
        schedules.append(GroupSchedule(
            index=gi,
            frames=tuple(frames),
            append_mode=append_mode,
            write_slots=write_slots,
            visible_frames=vis_now,
            visible_slots=tuple(cache_slot(f) for f in vis_now),
            anchor_group=(gi == anchor_group),
            reseed=tuple(reseeds.get(gi, ())),
        ))
    return ChunkPlan(
        name=name,
        clean_steps=tuple(clean_steps),
        groups=tuple(schedules),
        anchor_group_index=anchor_group,
        handoff_frames=tuple(handoff_frames),
    )


def t2v_plan() -> ChunkPlan:
    """The t2v window plan (casual_fps_inference.py:250-326).

    Group 0 = context frames {0,1}; group 1 = anchors {2,3,10,11,12,19,20};
    group 2 = fill {4..9} with frames {19,20} blinded; group 3 = fill
    {13..18} with {19,20} visible again, run in append mode.
    Fill-group boundary latents are re-seeded from denoised anchors:
    group 2 gets frames (3 -> pos0, 10 -> pos-1); group 3 gets (12 -> pos0,
    19 -> pos-1)  (casual_fps_inference.py:283-318).
    Handoff after group 1: frames [0] + anchors (casual_fps_inference.py:381).
    """
    return _build_plan(
        "t2v",
        T2V_CLEAN_STEPS,
        anchor_group=1,
        handoff_frames=(0, 2, 3, 10, 11, 12, 19, 20),
        vis_toggles={2: ("remove", (19, 20)), 3: ("add", (19, 20))},
        reseeds={2: ((0, 3), (5, 10)), 3: ((0, 12), (5, 19))},
    )


def i2v_plan() -> ChunkPlan:
    """The i2v window plan (MMPL_i2v/pipeline/casual_fps_inference.py:253-345).

    Adds a dedicated group for frame 0 (the encoded conditioning image) and
    performs no visibility toggles / boundary re-seeding.  Handoff after the
    anchor group saves [frame0, frame19, frame20]
    (MMPL_i2v/.../casual_fps_inference.py:341-343).
    """
    return _build_plan(
        "i2v",
        I2V_CLEAN_STEPS,
        anchor_group=2,
        handoff_frames=(0, 19, 20),
        vis_toggles={},
        reseeds={},
    )


def slots_to_token_indices(slots: Sequence[int],
                           frame_tokens: int = TOKENS_PER_FRAME) -> List[int]:
    """Expand frame slots to flat token indices (causal_fps_model.py:221)."""
    return [s * frame_tokens + t for s in slots for t in range(frame_tokens)]
