"""Plan/visibility algebra vs constants extracted from the reference.

Expected values are hand-derived from
`MMPL_t2v/pipeline/casual_fps_inference.py:250-334` and
`MMPL_t2v/wan/modules/causal_fps_model.py:193-264` (see SURVEY.md §2.1).
"""

import pytest

from mmpl_tpu.core import geometry as G


def test_window_constants():
    assert G.tokens_per_frame(480, 832) == 1560
    assert G.WINDOW_TOKENS == 32760
    assert G.KV_CACHE_SLOTS == 15
    assert G.latent_grid(480, 832) == (30, 52)
    assert G.pixel_frames(21) == 81
    assert G.latent_frames(81) == 21


def test_cache_slot_remap():
    # causal_fps_model.py:220: frames >= 19 stored at slot-6
    assert [G.cache_slot(f) for f in range(15)] == list(range(15))
    assert G.cache_slot(19) == 13
    assert G.cache_slot(20) == 14
    for f in (15, 16, 17, 18):
        with pytest.raises(ValueError):
            G.cache_slot(f)


def test_t2v_groups():
    plan = G.t2v_plan()
    assert plan.group_sizes == (2, 7, 6, 6)  # casual_fps_inference.py:251
    g = plan.groups
    assert g[0].frames == (0, 1)
    assert g[1].frames == (2, 3, 10, 11, 12, 19, 20)
    assert g[2].frames == (4, 5, 6, 7, 8, 9)
    assert g[3].frames == (13, 14, 15, 16, 17, 18)


def test_t2v_visibility_evolution():
    plan = G.t2v_plan()
    g = plan.groups
    # group0 writes frames {0,1} and sees itself
    assert not g[0].append_mode
    assert g[0].write_slots == (0, 1)
    assert g[0].visible_frames == (0, 1)
    # anchors: write with the slot-6 remap for frames 19/20
    assert not g[1].append_mode
    assert g[1].write_slots == (2, 3, 10, 11, 12, 13, 14)
    assert g[1].visible_frames == (0, 1, 2, 3, 10, 11, 12, 19, 20)
    assert g[1].visible_slots == (0, 1, 2, 3, 10, 11, 12, 13, 14)
    # fill-1: frames 19/20 blinded (casual_fps_inference.py:297-302);
    # sees frames 0..12 after its own write
    assert not g[2].append_mode
    assert g[2].write_slots == (4, 5, 6, 7, 8, 9)
    assert g[2].visible_frames == tuple(range(13))
    # fill-2: append mode (contains frame 15); 19/20 restored -> sees all 15
    # cached frames (plus its own in-flight keys)
    assert g[3].append_mode
    assert g[3].write_slots == ()
    assert g[3].visible_frames == tuple(range(13)) + (19, 20)
    assert g[3].visible_slots == tuple(range(15))


def test_t2v_anchor_handoff():
    plan = G.t2v_plan()
    assert plan.anchor_group_index == 1
    # torch.save(cat([output[:, :1], latents])) -> frame0 + anchor frames
    assert plan.handoff_frames == (0, 2, 3, 10, 11, 12, 19, 20)
    # re-seed sources (casual_fps_inference.py:283-318)
    assert plan.groups[2].reseed == ((0, 3), (5, 10))
    assert plan.groups[3].reseed == ((0, 12), (5, 19))


def test_i2v_groups():
    plan = G.i2v_plan()
    assert plan.group_sizes == (1, 1, 7, 6, 6)
    g = plan.groups
    assert g[0].frames == (0,)
    assert g[1].frames == (1,)
    assert g[2].frames == (2, 3, 10, 11, 12, 19, 20)
    assert g[3].frames == (4, 5, 6, 7, 8, 9)
    assert g[4].frames == (13, 14, 15, 16, 17, 18)
    # i2v has no visibility toggles: fill-1 sees the anchors 19/20 too
    assert g[3].visible_frames == tuple(range(13)) + (19, 20)
    assert g[4].append_mode
    assert g[4].visible_slots == tuple(range(15))
    assert plan.anchor_group_index == 2
    assert plan.handoff_frames == (0, 19, 20)
    for gr in g:
        assert gr.reseed == ()


def test_slots_to_token_indices():
    # causal_fps_model.py:221 expansion
    assert G.slots_to_token_indices([0, 2], frame_tokens=4) == [
        0, 1, 2, 3, 8, 9, 10, 11]
