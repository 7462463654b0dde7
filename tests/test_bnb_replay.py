"""bnb_replay (vectorized) vs a scalar transcription of rmap.cpp's
branch-and-bound — bit-parity including the early-abandon path."""

import numpy as np
import pytest

from rawalign_tpu import config
from rawalign_tpu.golden.chain import Chain
from rawalign_tpu.map.postprocess import bnb_replay


def _scalar_bnb(chains, part_costs, opt):
    """Direct transcription of the per-part scalar loop
    (rmap.cpp:243-280,509-530), kept as the test oracle."""
    post = []
    best_found = 0.0
    for chain, costs in zip(chains, part_costs):
        sa = chain.anchors[chain.n_anchors - 1]
        ea = chain.anchors[0]
        read_size = int(ea[1]) - int(sa[1]) + 1
        current_max = np.float32(read_size) * np.float32(opt.dtw_match_bonus)
        abandoned = False
        dtw_cost = np.float32(0.0)
        num_aligned = 0
        parts = chain.n_anchors - 1
        for part in range(parts):
            if current_max < best_found:
                abandoned = True
                break
            sub = np.float32(costs[part])
            dtw_cost += sub
            current_max -= sub
            sa_p = chain.anchors[parts - part]
            ea_p = chain.anchors[parts - part - 1]
            num_aligned += int(ea_p[1]) - int(sa_p[1]) + 1
        if abandoned:
            chain.alignment_score = -1e10
            continue
        chain.alignment_score = float(
            np.float32(num_aligned) * np.float32(opt.dtw_match_bonus)
            - dtw_cost
        )
        if chain.alignment_score >= opt.dtw_min_score:
            if chain.alignment_score > best_found:
                best_found = chain.alignment_score
            post.append(chain)
    return post


def _mk_chain(rng, n_anchors, score):
    q = np.sort(rng.integers(0, 3000, n_anchors).astype(np.uint32))[::-1]
    t = np.sort(rng.integers(0, 3000, n_anchors).astype(np.uint32))[::-1]
    anchors = np.stack([t, q], axis=1).astype(np.uint32)
    return Chain(
        chaining_score=float(score), alignment_score=0.0,
        reference_sequence_index=0, start_position=int(t[-1]),
        end_position=int(t[0]), n_anchors=n_anchors, mapq=0, strand=0,
        anchors=anchors,
    )


@pytest.mark.parametrize("seed", range(8))
def test_bnb_replay_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    opt = config.MappingOptions()
    opt.dtw_border_constraint = config.BorderConstraint.SPARSE
    # mix cheap and expensive chains so best_found rises and later
    # chains hit the early-abandon branch
    chains_a, chains_b, costs = [], [], []
    for ci in range(6):
        n = int(rng.integers(2, 40))
        ch = _mk_chain(rng, n, score=100 - ci)
        import copy

        chains_a.append(ch)
        chains_b.append(copy.deepcopy(ch))
        scale = 0.05 if ci % 2 == 0 else 5.0
        costs.append(
            (rng.random(n - 1) * scale).astype(np.float32)
        )
    want = _scalar_bnb(chains_a, costs, opt)
    got = bnb_replay(chains_b, costs, opt)
    assert len(want) == len(got)
    for a, b in zip(chains_a, chains_b):
        assert a.alignment_score == b.alignment_score, (
            a.alignment_score, b.alignment_score,
        )


def test_bnb_replay_single_anchor_chain():
    rng = np.random.default_rng(3)
    opt = config.MappingOptions()
    opt.dtw_border_constraint = config.BorderConstraint.SPARSE
    ch = _mk_chain(rng, 1, score=10)
    out = bnb_replay([ch], [np.zeros(0, np.float32)], opt)
    # parts == 0: no costs consumed, score = 0 * bonus - 0
    assert ch.alignment_score == 0.0
    assert (out == [ch]) == (0.0 >= opt.dtw_min_score)
