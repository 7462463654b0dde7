"""Tests for config/presets, pore model, FASTA IO and seq->signal."""

import numpy as np
import pytest

from rawalign_tpu import config
from rawalign_tpu import pore_model as pm
from rawalign_tpu.io import fasta
from rawalign_tpu.signal import seq2sig


def test_defaults_match_reference():
    io = config.IndexOptions()
    mo = config.MappingOptions()
    # spot-check against roptions.c:5-61 / rawindex.cpp:465-472
    assert (io.e, io.q, io.lq, io.k, io.w, io.b) == (6, 9, 3, 6, 0, 14)
    assert (mo.bp_per_sec, mo.sample_rate, mo.chunk_size) == (450, 4000, 4000)
    assert (mo.max_gap_length, mo.max_target_gap_length) == (2000, 5000)
    assert (mo.chaining_band_length, mo.max_num_skips) == (5000, 25)
    assert mo.dtw_border_constraint == config.BorderConstraint.SPARSE
    assert mo.dtw_fill_method == config.FillMethod.BANDED
    assert (mo.dtw_band_radius_frac, mo.dtw_match_bonus, mo.dtw_min_score) == (
        0.10,
        0.4,
        20.0,
    )
    assert (mo.window_length1, mo.window_length2) == (3, 6)
    assert mo.threshold1 == pytest.approx(4.30265)
    assert mo.threshold2 == pytest.approx(2.57058)


def test_presets():
    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("viral", io, mo)
    assert (io.e, io.q, io.lq, io.w) == (5, 9, 3, 0)
    config.set_opt("faster", io, mo)
    assert io.w == 5 and io.e == 7
    with pytest.raises(ValueError):
        config.set_opt("bogus", io, mo)


def test_pore_model_roundtrip(tmp_path):
    model = pm.synthetic_pore_model(k=5, seed=3)
    path = str(tmp_path / "model.txt")
    pm.save_pore_model(path, model)
    loaded = pm.load_pore_model(path)
    assert loaded.k == 5
    np.testing.assert_allclose(loaded.level_mean, model.level_mean, atol=1e-4)


def test_encode_kmer():
    assert pm.encode_kmer("AAAAAA") == 0
    assert pm.encode_kmer("TTTTTT") == 4**6 - 1
    assert pm.encode_kmer("ACGT") == 0b00011011
    # ambiguous base shifts in 00 (A)
    assert pm.encode_kmer("NC") == pm.encode_kmer("AC")


def test_fasta_roundtrip(tmp_path):
    seqs = [("s1", "ACGTACGTAA"), ("s2", "GGGCCC")]
    path = str(tmp_path / "x.fa")
    fasta.write_fasta(path, seqs, width=4)
    back = list(fasta.read_fasta(path))
    assert [(s.name, s.seq) for s in back] == seqs


def test_seq_to_sig_basic():
    rng = np.random.default_rng(0)
    pore_vals = rng.uniform(60, 130, size=4**6).astype(np.float32)
    seq = "".join(rng.choice(list("ACGT"), size=200))
    codes = seq2sig.seq_to_codes(seq)
    s0 = seq2sig.seq_to_sig(codes, pore_vals, 6, 0)
    s1 = seq2sig.seq_to_sig(codes, pore_vals, 6, 1)
    assert s0.size == s1.size == 200 - 6 + 1
    # z-normalized
    for s in (s0, s1):
        assert abs(float(np.mean(s))) < 1e-4
        assert abs(float(np.std(s)) - 1.0) < 1e-3
    # strand-1 signal equals the forward conversion of the reverse complement
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(seq))
    s_rc = seq2sig.seq_to_sig(seq2sig.seq_to_codes(rc), pore_vals, 6, 0)
    np.testing.assert_allclose(s1, s_rc, atol=1e-6)


def test_seq_to_sig_matches_naive_loop():
    """Direct transcription of rsig.cpp:7-41 as an independent check."""
    rng = np.random.default_rng(1)
    k = 4
    pore_vals = rng.uniform(60, 130, size=4**k).astype(np.float32)
    seq = "ACGTNNACGGTTACNA"

    def naive(seq, strand):
        mask = (1 << (2 * k)) - 1
        kmer = 0
        vals = []
        n = len(seq)
        for i in range(n):
            pos = n - i - 1 if strand else i
            c = pm.SEQ_NT4[ord(seq[pos])]
            if c < 4:
                kmer = ((kmer << 2) | (3 ^ int(c) if strand else int(c))) & mask
            else:
                kmer = (kmer << 2) & mask
            if i + 1 < k:
                continue
            vals.append(pore_vals[kmer])
        vals = np.asarray(vals, dtype=np.float32)
        m = np.sum(vals, dtype=np.float64) / vals.size
        std = np.sqrt(np.sum(vals.astype(np.float64) ** 2) / vals.size - m * m)
        return ((vals - m) / std).astype(np.float32)

    codes = seq2sig.seq_to_codes(seq)
    for strand in (0, 1):
        np.testing.assert_array_equal(
            seq2sig.seq_to_sig(codes, pore_vals, k, strand), naive(seq, strand)
        )


def test_seq_to_sig_znorm_is_sequential_left_fold():
    """The z-norm accumulators must fold SEQUENTIALLY in double, as the
    reference does (rsig.cpp:28-35) — np.sum's pairwise summation
    differs in the low bits and flips ~1-ulp normalized values per
    megabase, which round-5's CIGAR byte-comparison against the binary
    exposed (the per-element `difference` column). Pinned against an
    explicit Python left-fold on a sequence long enough that pairwise
    and sequential sums genuinely differ."""
    from rawalign_tpu import native

    if not native.znorm_sums_available():
        pytest.skip("native ra_znorm_sums required for order-exactness")
    rng = np.random.default_rng(5)
    k = 6
    pore_vals = rng.uniform(60, 130, size=4**k).astype(np.float32)
    seq = "".join(rng.choice(list("ACGT"), size=200_001))
    codes = seq2sig.seq_to_codes(seq)
    out = seq2sig.seq_to_sig(codes, pore_vals, k, 0)

    # independent sequential fold over the same value stream
    eff = np.where(codes < 4, codes, 0).astype(np.int64)
    kmers = np.zeros(codes.size - k + 1, dtype=np.int64)
    for j in range(k):
        kmers <<= 2
        kmers |= eff[j : codes.size - k + 1 + j]
    vals = pore_vals[kmers].astype(np.float32)
    s = s2 = 0.0
    for x in vals.tolist():
        s += x
        s2 += x * x
    # pairwise and sequential must actually disagree here, else the
    # test proves nothing
    assert s2 != float(np.sum(vals.astype(np.float64) ** 2))
    m = np.float64(s) / vals.size
    std = np.sqrt(np.float64(s2) / vals.size - m * m)
    expect = ((vals - m) / std).astype(np.float32)
    np.testing.assert_array_equal(out, expect)
