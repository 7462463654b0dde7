"""Regression tests for the round-2 hardening fixes:

- C float-division semantics in the mapping decision / MAPQ (the
  reference divides chain scores that can be 0 with
  --no-chainingscore-filtering; rmap.cpp:605,652,74-86)
- observability flags --dtw-log-scores / --log-anchors /
  --log-num-anchors emit reference-format stderr lines
  (rmap.cpp:308-312,403-425)
- SLOW5 zero-length records
- prefetch no-deadlock under slot exhaustion
"""

import numpy as np
import pytest

from rawalign_tpu.config import MappingFlag, MappingOptions
from rawalign_tpu.golden import chain as gchain
from rawalign_tpu.golden import engine as gengine


def _mk_chain(cs, als, n_anchors=3):
    return gchain.Chain(
        chaining_score=cs,
        alignment_score=als,
        reference_sequence_index=0,
        start_position=10,
        end_position=40,
        n_anchors=n_anchors,
        mapq=0,
        strand=0,
        anchors=np.array([[40, 30], [25, 15], [10, 5]], dtype=np.uint32),
    )


def test_c_fdiv_semantics():
    assert gengine.c_fdiv(1.0, 0.0) == float("inf")
    assert gengine.c_fdiv(-1.0, 0.0) == float("-inf")
    assert gengine.c_fdiv(0.0, 0.0) != gengine.c_fdiv(0.0, 0.0)  # nan
    assert gengine.c_fdiv(6.0, 3.0) == 2.0


def test_decision_zero_scores_no_crash():
    """Second chain with zero score must not raise; x/0=inf maps like C."""
    opt = MappingOptions()
    opt.flag |= MappingFlag.DTW_EVALUATE_CHAINS
    st = gengine.ReadState(read_name="r")
    st.chains = [_mk_chain(30.0, 50.0), _mk_chain(10.0, 0.0)]
    # 50/0 = inf >= 1.2 -> mapped
    assert gengine.is_mapped_with_high_confidence(st, opt)
    st.chains = [_mk_chain(30.0, 0.0), _mk_chain(10.0, 0.0)]
    # 0/0 = nan -> falls through to meanmap: 0 >= 5*0 -> True (like C)
    assert gengine.is_mapped_with_high_confidence(st, opt)
    # chaining-score path
    opt2 = MappingOptions()
    st.chains = [_mk_chain(0.0, 0.0), _mk_chain(0.0, 0.0)]
    assert gengine.is_mapped_with_high_confidence(st, opt2)


def test_comp_mapq_zero_scores_no_crash():
    opt = MappingOptions()
    opt.flag |= MappingFlag.DTW_EVALUATE_CHAINS
    chains = [_mk_chain(30.0, 0.0), _mk_chain(10.0, 0.0)]
    gchain.comp_mapq(chains, opt)  # nan ratio -> INT_MIN cast -> clamp 0
    assert chains[0].mapq == 0
    chains = [_mk_chain(30.0, 0.0), _mk_chain(10.0, -5.0)]
    gchain.comp_mapq(chains, opt)  # -5/0 = -inf -> 40*(1-(-inf))=inf -> 60
    assert chains[0].mapq == 60
    chains = [_mk_chain(30.0, 50.0), _mk_chain(10.0, 25.0)]
    gchain.comp_mapq(chains, opt)
    assert chains[0].mapq == 20


def test_log_flags_emit(capsys):
    """--dtw-log-scores / --log-anchors / --log-num-anchors produce the
    reference's stderr formats via the golden engine."""
    from rawalign_tpu import config, pore_model
    from rawalign_tpu.index import index as rindex
    from rawalign_tpu.testing import synth

    ds = synth.make_dataset(
        seed=5, genome_lengths=[20000], n_reads=2, read_len_bp=(300, 400)
    )
    io = config.IndexOptions()
    mo = config.MappingOptions()
    config.set_opt("sensitive", io, mo)
    mo.flag |= (
        MappingFlag.DTW_EVALUATE_CHAINS
        | MappingFlag.DTW_LOG_SCORES
        | MappingFlag.LOG_ANCHORS
        | MappingFlag.LOG_NUM_ANCHORS
    )
    idx = rindex.build_index(ds.seqs, ds.model.pore_vals, io)
    r = ds.reads[0]
    gengine.map_read(idx, r.signal, r.name, mo)
    err = capsys.readouterr().err
    assert "chaining_score=" in err and "alignment_score=" in err
    assert f"readname={r.name} refname=" in err and "strand=0 anchors=" in err
    assert "num_anchors=" in err and "pos=[0," in err


def test_log_flags_emit_device_engine(capsys):
    from rawalign_tpu import config
    from rawalign_tpu.index import index as rindex
    from rawalign_tpu.map.engine import MappingEngine
    from rawalign_tpu.testing import synth

    ds = synth.make_dataset(
        seed=5, genome_lengths=[20000], n_reads=2, read_len_bp=(300, 400)
    )
    io = config.IndexOptions()
    mo = config.MappingOptions()
    config.set_opt("sensitive", io, mo)
    mo.max_events_per_chunk = 512
    mo.flag |= (
        MappingFlag.DTW_EVALUATE_CHAINS
        | MappingFlag.DTW_LOG_SCORES
        | MappingFlag.LOG_ANCHORS
        | MappingFlag.LOG_NUM_ANCHORS
    )
    idx = rindex.build_index(ds.seqs, ds.model.pore_vals, io)
    eng = MappingEngine(idx, mo, batch_size=2)
    reads = [(r.name, r.signal) for r in ds.reads]
    results = list(eng.map_reads(reads))
    assert results
    err = capsys.readouterr().err
    assert "chaining_score=" in err
    assert "anchors=" in err and "num_anchors=" in err


def test_slow5_zero_length_record(tmp_path):
    from rawalign_tpu.io import slow5

    p = str(tmp_path / "z.slow5")
    slow5.write_slow5(
        p, [("empty", np.zeros(0, np.float32)), ("one", np.array([80.0], np.float32))]
    )
    out = list(slow5.read_slow5(p))
    assert [r[0] for r in out] == ["empty", "one"]
    assert out[0][1].size == 0


def test_slow5_missing_column_fails_at_header(tmp_path):
    p = str(tmp_path / "bad.slow5")
    with open(p, "w") as f:
        f.write("#read_id\tdigitisation\n")  # header missing required cols
    with pytest.raises(ValueError, match="missing SLOW5 columns"):
        list(read := __import__(
            "rawalign_tpu.io.slow5", fromlist=["read_slow5"]
        ).read_slow5(p))


def test_prefetch_no_deadlock(tmp_path):
    """More files than depth slots with many workers must not deadlock."""
    from rawalign_tpu.io import fast5, prefetch

    paths = []
    for i in range(8):
        p = str(tmp_path / f"r{i}.sigbin.npz")
        fast5.write_sigbin(
            p, [(f"read{i}", np.full(64, 80.0, np.float32))]
        )
        paths.append(p)
    out = list(prefetch.prefetch_signals(paths, n_threads=6, depth=2))
    assert [name for name, _ in out] == [f"read{i}" for i in range(8)]


def test_vbz_error_message(tmp_path):
    """A FAST5 whose Signal uses an unavailable filter surfaces the
    actionable VBZ message instead of an opaque h5py OSError."""
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "vbz.fast5")
    with h5py.File(p, "w") as f:
        grp = f.create_group("read_abc")
        raw = grp.create_group("Raw")
        # create a dataset claiming the vbz filter id without the plugin:
        # h5py refuses unknown filters at write time unless
        # allow_unknown_filter=True
        try:
            ds = raw.create_dataset(
                "Signal",
                shape=(16,),
                chunks=(16,),
                dtype=np.int16,
                compression=32020,
                allow_unknown_filter=True,
            )
            # store opaque "compressed" bytes directly so a read must
            # run the (absent) vbz filter
            ds.id.write_direct_chunk((0,), b"\x01\x02\x03\x04")
        except Exception:
            pytest.skip("h5py cannot create unknown-filter dataset")
        raw.attrs["read_id"] = np.bytes_("abc")
        ch = grp.create_group("channel_id")
        ch.attrs["digitisation"] = np.float64(8192.0)
        ch.attrs["range"] = np.float64(1400.0)
        ch.attrs["offset"] = np.float64(10.0)
    from rawalign_tpu.io import fast5 as f5

    with pytest.raises(RuntimeError, match="HDF5_PLUGIN_PATH"):
        list(f5.read_fast5(p))
