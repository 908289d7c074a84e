"""InstanceStore ops vs heapq/torch oracles."""
import heapq

import numpy as np
import jax.numpy as jnp
import torch

from ovo_tpu.mapping import instances as inst
from ovo_tpu.mapping.instances import init_instance_store


def oracle_heap_run(events, n_top):
    """events: list of (kf, area) for ONE instance; returns final set of
    (area, kf) using the reference's add_top_kf semantics."""
    top = []
    for kf, area in events:
        idx = next((i for i, (_, k) in enumerate(top) if k == kf), -1)
        if idx > -1:
            if area > top[idx][0]:
                top[idx] = (area, kf)
                heapq.heapify(top)
        elif len(top) < n_top:
            heapq.heappush(top, (area, kf))
        else:
            heapq.heappushpop(top, (area, kf))
    return sorted(top)


def test_top_kf_matches_heapq_oracle(rng):
    n_top = 4
    store = init_instance_store(4, clip_dim=4, n_slots=n_top)
    store = inst.mint_instances(store, jnp.asarray(2, jnp.int32))
    events = [(kf, int(rng.integers(1, 50))) for kf in range(20)]
    for kf, area in events:
        store = inst.add_top_kf(
            store,
            jnp.asarray([0], jnp.int32), jnp.asarray(kf, jnp.int32),
            jnp.asarray([area], jnp.int32), jnp.asarray([True]))
    got = sorted((int(a), int(k)) for a, k in
                 zip(np.asarray(store.top_area[0]), np.asarray(store.top_kf[0]))
                 if a >= 0)
    assert got == oracle_heap_run(events, n_top)


def test_top_kf_area_tie_breaks_on_kf(rng):
    # equal areas: heap min is the SMALLEST kf; it should be evicted first
    n_top = 2
    store = init_instance_store(2, clip_dim=4, n_slots=n_top)
    store = inst.mint_instances(store, jnp.asarray(1, jnp.int32))
    events = [(0, 10), (1, 10), (2, 10)]  # kf2 should evict kf0
    for kf, area in events:
        store = inst.add_top_kf(store, jnp.asarray([0], jnp.int32),
                                jnp.asarray(kf, jnp.int32),
                                jnp.asarray([area], jnp.int32),
                                jnp.asarray([True]))
    got = sorted((int(a), int(k)) for a, k in
                 zip(np.asarray(store.top_area[0]), np.asarray(store.top_kf[0]))
                 if a >= 0)
    assert got == oracle_heap_run(events, n_top) == [(10, 1), (10, 2)]


def test_streaming_avg_matches_batch_mean(rng):
    D = 8
    store = init_instance_store(4, clip_dim=D)
    store = inst.mint_instances(store, jnp.asarray(2, jnp.int32))
    descs = rng.standard_normal((5, D)).astype(np.float32)
    for kf in range(5):
        store = inst.update_descriptors(
            store, jnp.asarray([0], jnp.int32), jnp.asarray(descs[kf:kf + 1]),
            jnp.asarray(kf, jnp.int32), jnp.asarray([True]),
            fusion="avg_pooling")
    np.testing.assert_allclose(np.asarray(store.clip_feature[0]),
                               descs.mean(0), rtol=1e-5)
    assert bool(store.has_clip[0]) and not bool(store.has_clip[1])


def test_invalid_entries_do_not_clobber(rng):
    D = 4
    store = init_instance_store(4, clip_dim=D)
    store = inst.mint_instances(store, jnp.asarray(1, jnp.int32))
    d = rng.standard_normal((2, D)).astype(np.float32)
    # batch: [valid ins0, invalid -1]; the invalid row must not touch ins0
    store = inst.update_descriptors(
        store, jnp.asarray([0, -1], jnp.int32), jnp.asarray(d),
        jnp.asarray(0, jnp.int32), jnp.asarray([True, True]))
    np.testing.assert_allclose(np.asarray(store.clip_feature[0]), d[0], rtol=1e-6)
    assert int(store.desc_cnt[0]) == 1
    assert int(store.desc_cnt.sum()) == 1


def _torch_l1_medoid(clips):
    c = torch.from_numpy(clips)[None]  # (1, T, D)
    l1 = torch.abs(c - c.permute(1, 0, 2)).sum((1, 2))
    return clips[int(l1.argmin())]


def _torch_cos_medoid(clips):
    c = torch.from_numpy(clips)[None]
    cs = torch.cosine_similarity(c, c.permute(1, 0, 2), dim=-1).sum(-1)
    return clips[int(cs.argmax())]


def test_medoid_fusions_match_torch_oracle(rng):
    D, T = 16, 6
    descs = rng.standard_normal((T, D)).astype(np.float32)
    for fusion, oracle in (("l1_medoid", _torch_l1_medoid),
                           ("cossim_medoid", _torch_cos_medoid)):
        store = init_instance_store(2, clip_dim=D, n_slots=T,
                                    store_slot_descs=True)
        store = inst.mint_instances(store, jnp.asarray(1, jnp.int32))
        for kf in range(T):
            store = inst.add_top_kf(store, jnp.asarray([0], jnp.int32),
                                    jnp.asarray(kf, jnp.int32),
                                    jnp.asarray([100 + kf], jnp.int32),
                                    jnp.asarray([True]))
            store = inst.update_descriptors(
                store, jnp.asarray([0], jnp.int32),
                jnp.asarray(descs[kf:kf + 1]), jnp.asarray(kf, jnp.int32),
                jnp.asarray([True]), fusion=fusion)
        np.testing.assert_allclose(np.asarray(store.clip_feature[0]),
                                   oracle(descs), rtol=1e-5)


def test_eviction_invalidates_slot_descriptor(rng):
    D, T = 4, 2
    store = init_instance_store(2, clip_dim=D, n_slots=T,
                                store_slot_descs=True)
    store = inst.mint_instances(store, jnp.asarray(1, jnp.int32))
    zero = jnp.asarray([0], jnp.int32)
    tru = jnp.asarray([True])
    for kf, area in [(0, 10), (1, 20)]:
        store = inst.add_top_kf(store, zero, jnp.asarray(kf, jnp.int32),
                                jnp.asarray([area], jnp.int32), tru)
        store = inst.update_descriptors(
            store, zero, jnp.ones((1, D), jnp.float32) * (kf + 1),
            jnp.asarray(kf, jnp.int32), tru, fusion="l1_medoid")
    # kf2 with bigger area evicts kf0's slot; its stored desc must invalidate
    store = inst.add_top_kf(store, zero, jnp.asarray(2, jnp.int32),
                            jnp.asarray([30], jnp.int32), tru)
    kfs = set(int(k) for k in np.asarray(store.top_kf[0]))
    assert kfs == {1, 2}
    slot_of_kf2 = int(np.argmax(np.asarray(store.top_kf[0]) == 2))
    assert not bool(store.slot_valid[0, slot_of_kf2])


def _upd(store, ids, descs, kf, valid, fusion="avg_pooling"):
    return inst.update_descriptors(
        store, jnp.asarray(ids, jnp.int32), jnp.asarray(descs, jnp.float32),
        jnp.asarray(kf, jnp.int32), jnp.asarray(valid), fusion=fusion)


def test_drop_keyframe_descriptors_avg_oracle(rng):
    """Deleting a kf's descriptors re-fuses to the mean of the survivors
    exactly (ovo.py:372-379 + update_objects_clip)."""
    D = 8
    store = init_instance_store(4, clip_dim=D, n_slots=4)
    store = inst.mint_instances(store, jnp.asarray(2, jnp.int32))
    d0 = rng.normal(size=(2, D)).astype(np.float32)   # kf 0: ins 0, 1
    d1 = rng.normal(size=(2, D)).astype(np.float32)   # kf 1: ins 0 only
    store = inst.add_top_kf(store, jnp.asarray([0, 1], jnp.int32),
                            jnp.asarray(0, jnp.int32),
                            jnp.asarray([10, 10], jnp.int32),
                            jnp.asarray([True, True]))
    store = _upd(store, [0, 1], d0, 0, [True, True])
    store = inst.add_top_kf(store, jnp.asarray([0, -1], jnp.int32),
                            jnp.asarray(1, jnp.int32),
                            jnp.asarray([20, -1], jnp.int32),
                            jnp.asarray([True, False]))
    store = _upd(store, [0, -1], d1, 1, [True, False])
    np.testing.assert_allclose(np.asarray(store.clip_feature[0]),
                               (d0[0] + d1[0]) / 2, rtol=1e-6)

    # drop kf 0: ins0 keeps exactly kf1's desc; ins1 loses its only view
    store = inst.drop_keyframe_descriptors(
        store, jnp.asarray([0, 1], jnp.int32), jnp.asarray(d0),
        jnp.asarray([True, True]), jnp.asarray([0, -2], jnp.int32))
    np.testing.assert_allclose(np.asarray(store.clip_feature[0]), d1[0],
                               rtol=1e-6)
    assert bool(store.has_clip[0])
    assert not bool(store.has_clip[1])
    assert int(store.desc_cnt[1]) == 0
    # kf 0 evicted from every top slot; kf 1 survives
    assert not np.any(np.asarray(store.top_kf) == 0)
    assert np.any(np.asarray(store.top_kf[0]) == 1)


def test_drop_keyframe_descriptors_medoid(rng):
    """Medoid fusion recomputes over surviving slots after a kf drop."""
    D = 8
    store = init_instance_store(2, clip_dim=D, n_slots=3,
                                store_slot_descs=True)
    store = inst.mint_instances(store, jnp.asarray(1, jnp.int32))
    descs = rng.normal(size=(3, D)).astype(np.float32)
    for kf in range(3):
        store = inst.add_top_kf(store, jnp.asarray([0], jnp.int32),
                                jnp.asarray(kf, jnp.int32),
                                jnp.asarray([10 + kf], jnp.int32),
                                jnp.asarray([True]))
        store = _upd(store, [0], descs[kf:kf + 1], kf, [True],
                     fusion="l1_medoid")
    # oracle: l1 medoid over the two SURVIVING views after dropping kf 1
    keep = [0, 2]
    d = descs[keep]
    cost = np.abs(d[:, None, :] - d[None, :, :]).sum(-1).sum(1)
    expect = d[int(np.argmin(cost))]
    store = inst.drop_keyframe_descriptors(
        store, jnp.asarray([0], jnp.int32), descs[1:2],
        jnp.asarray([True]), jnp.asarray([1, -2], jnp.int32),
        fusion="l1_medoid")
    np.testing.assert_allclose(np.asarray(store.clip_feature[0]), expect,
                               rtol=1e-6)
    assert not np.any(np.asarray(store.top_kf) == 1)
