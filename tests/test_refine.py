"""Refinement subsystem tests: banding, DP parity vs oracle, rescaling."""

import numpy as np
import pytest

from remora_tpu.refine import dp as fast_dp
from remora_tpu.refine.band import (
    adjust_seq_band,
    compute_sig_band,
    convert_to_seq_band,
    validate_band,
)
from remora_tpu.refine.levels import all_kmers, extract_levels, index_from_kmer
from remora_tpu.refine.refiner import SigMapRefiner, compute_dwell_pen_array

from tests import oracle_dp


def test_index_from_kmer():
    assert index_from_kmer("AAA") == 0
    assert index_from_kmer("AAC") == 1
    assert index_from_kmer("CAA") == 16
    assert index_from_kmer("TTT") == 63


def test_extract_levels():
    levels_arr = np.arange(64, dtype=np.float32)
    int_seq = np.array([0, 1, 2, 3, 0])
    lv = extract_levels(int_seq, levels_arr, 3, 1)
    # windows: ACG=6, CGT=27, GTA=44
    assert lv.tolist() == [0.0, 6.0, 27.0, 44.0, 0.0]


def test_dwell_pen_array():
    arr = compute_dwell_pen_array(4, 3, 0.5)
    assert np.allclose(arr, [8.0, 4.5, 2.0])
    # limit clipped to target
    arr = compute_dwell_pen_array(2, 5, 1.0)
    assert arr.size == 2


def _random_band(rng, seq_len, max_spb=12, bhw=5):
    spb = rng.integers(1, max_spb, seq_len)
    bps = np.concatenate([[0], np.cumsum(spb)]).astype(np.int64)
    levels = rng.normal(size=seq_len).astype(np.float32)
    sig_band = compute_sig_band(bps, levels, bhw=bhw)
    seq_band = convert_to_seq_band(sig_band)
    adjust_seq_band(seq_band)
    return bps, levels, seq_band


def test_band_construction_valid():
    rng = np.random.default_rng(0)
    for _ in range(50):
        seq_len = int(rng.integers(5, 80))
        bps, levels, seq_band = _random_band(rng, seq_len)
        validate_band(
            seq_band, sig_len=int(bps[-1]), seq_len=seq_len, is_sig_band=False
        )


@pytest.mark.parametrize("algo", ["Viterbi", "dwell_penalty"])
def test_dp_matches_oracle(algo):
    rng = np.random.default_rng(11)
    sdp = compute_dwell_pen_array(4, 3, 0.5)
    for _ in range(30):
        seq_len = int(rng.integers(5, 50))
        bps, levels, seq_band = _random_band(rng, seq_len)
        signal = rng.normal(size=int(bps[-1])).astype(np.float32)
        s1, p1, t1, o1 = oracle_dp.seq_banded_dp(
            signal, levels, seq_band, sdp, algo
        )
        s2, p2, t2, o2 = fast_dp.seq_banded_dp(
            signal, levels, seq_band, sdp, algo
        )
        assert np.array_equal(p1, p2)
        assert np.array_equal(o1, o2)
        finite = np.isfinite(s1) & (s1 < 1e30)
        assert np.allclose(s1[finite], s2[finite], rtol=1e-4, atol=1e-4)


def _synthetic_refiner(scale_iters=2):
    base_lvl = {"A": -1.0, "C": -0.3, "G": 0.3, "T": 1.0}
    tbl = {
        k: base_lvl[k[1]] + 0.2 * base_lvl[k[0]] + 0.1 * base_lvl[k[2]]
        for k in all_kmers(3)
    }
    return SigMapRefiner.load_from_dict(
        tbl, do_rough_rescale=True, scale_iters=scale_iters
    )


def test_refiner_recovers_scaling():
    rng = np.random.default_rng(1)
    smr = _synthetic_refiner()
    assert smr.center_idx == 1
    n = 300
    int_seq = rng.integers(0, 4, n)
    levels = smr.extract_levels(int_seq)
    dwells = rng.integers(3, 12, n)
    true_map = np.concatenate([[0], np.cumsum(dwells)])
    sig = np.repeat(levels, dwells) + rng.normal(0, 0.15, true_map[-1])
    dacs = sig * 20.0 + 100.0
    init_map = true_map.copy()
    init_map[1:-1] = np.maximum.accumulate(
        np.clip(init_map[1:-1] + rng.integers(-3, 4, n - 1), 1, true_map[-1] - 1)
    )
    s1, c1 = smr.rough_rescale(90.0, 25.0, init_map, int_seq, dacs)
    new_map, s2, c2 = smr.refine_sig_map(s1, c1, init_map.copy(), int_seq, dacs)
    assert abs(s2 - 100) < 2 and abs(c2 - 20) < 1
    assert (
        np.abs(new_map - true_map).mean() < np.abs(init_map - true_map).mean()
    )


def test_refiner_metadata_roundtrip():
    smr = _synthetic_refiner()
    md = smr.asdict()
    smr2 = SigMapRefiner.load_from_metadata(md)
    assert smr2 == smr
    assert smr2.kmer_len == 3


def test_remora_read_refine_integration():
    from remora_tpu.data.read import RemoraRead

    rng = np.random.default_rng(5)
    smr = _synthetic_refiner(scale_iters=1)
    n = 200
    int_seq = rng.integers(0, 4, n)
    levels = smr.extract_levels(int_seq)
    dwells = rng.integers(4, 10, n)
    s2s = np.concatenate([[0], np.cumsum(dwells)])
    sig = np.repeat(levels, dwells) + rng.normal(0, 0.1, s2s[-1])
    dacs = sig * 15 + 50
    read = RemoraRead(
        dacs=dacs, shift=45.0, scale=18.0, seq_to_sig_map=s2s.copy(),
        int_seq=int_seq,
    )
    read.refine_signal_mapping(smr)
    assert abs(read.shift - 50) < 2
    assert abs(read.scale - 15) < 1
    read.check()


def _synthetic_read(rng, smr, n):
    from remora_tpu.data.read import RemoraRead

    int_seq = rng.integers(0, 4, n)
    levels = smr.extract_levels(int_seq)
    dwells = rng.integers(3, 11, n)
    s2s = np.concatenate([[0], np.cumsum(dwells)])
    sig = np.repeat(levels, dwells) + rng.normal(0, 0.12, s2s[-1])
    dacs = sig * 15 + 50
    return RemoraRead(
        dacs=dacs,
        shift=45.0 + rng.normal(0, 2),
        scale=18.0 + rng.normal(0, 1),
        seq_to_sig_map=s2s.copy(),
        int_seq=int_seq,
    )


@pytest.mark.parametrize("scale_iters", [0, 1, 2])
def test_refine_reads_batch_matches_per_read(scale_iters):
    """The batched device-DP entry point reproduces per-read results.

    scale_iters<=1 runs a single DP round, which is bit-identical by
    construction (host-exact normalization). scale_iters>=2 stages the
    signal on device and normalizes there in f32; DP ties on <=1-ulp
    signal differences can move a few path boundaries, which shifts the
    (discrete) Theil-Sen rescale slightly — compared with tolerance.
    """
    rng = np.random.default_rng(11)
    smr = _synthetic_refiner(scale_iters=scale_iters)
    reads = [_synthetic_read(rng, smr, n) for n in (120, 200, 80, 150)]
    singles = [rd.copy() for rd in reads]
    for rd in singles:
        rd.refine_signal_mapping(smr)
    errs = smr.refine_reads_batch(reads)
    assert errs == [None] * len(reads)
    for got, want in zip(reads, singles):
        if scale_iters <= 1:
            assert got.shift == want.shift and got.scale == want.scale
            assert np.array_equal(got.seq_to_sig_map, want.seq_to_sig_map)
        else:
            assert np.isclose(got.shift, want.shift, rtol=0.01, atol=0.2)
            assert np.isclose(got.scale, want.scale, rtol=0.02)
            diffs = np.abs(
                got.seq_to_sig_map.astype(np.int64)
                - want.seq_to_sig_map.astype(np.int64)
            )
            assert (diffs > 0).mean() < 0.10 and diffs.max() <= 8


def test_device_refine_falls_back_to_host(monkeypatch):
    """Any device-path failure inside refine_reads_batch degrades to the
    host DP (same results as backend=auto) instead of dropping reads —
    a refinement stage must never silently yield an empty dataset."""
    from remora_tpu.refine.refiner import SigMapRefiner

    rng = np.random.default_rng(9)
    smr_dev = _synthetic_refiner(scale_iters=1)
    smr_dev.backend = "device"
    smr_host = _synthetic_refiner(scale_iters=1)
    smr_host.backend = "auto"

    reads_dev = [_synthetic_read(rng, smr_dev, n) for n in (120, 300)]
    reads_host = [r.copy() for r in reads_dev]

    def boom(self, states):
        raise RuntimeError("simulated Mosaic VMEM OOM")

    monkeypatch.setattr(SigMapRefiner, "_device_refine_loop", boom)
    errs = smr_dev.refine_reads_batch(reads_dev)
    assert errs == [None, None]
    for rd in reads_host:
        rd.refine_signal_mapping(smr_host)
    for a, b in zip(reads_dev, reads_host):
        assert np.array_equal(a.seq_to_sig_map, b.seq_to_sig_map)
        assert a.shift == b.shift and a.scale == b.scale


def test_device_refine_band_cap_reroutes():
    """A read whose mapping demands a band wider than the device limit
    makes the batch reroute to the host path BEFORE any launch (the
    guard raises pre-compile), with results matching backend=auto."""
    from remora_tpu.constants import REFINE_DEVICE_MAX_BAND

    rng = np.random.default_rng(10)
    smr_dev = _synthetic_refiner(scale_iters=1)
    smr_dev.backend = "device"
    smr_dev.do_rough_rescale = False  # keep the planted geometry
    smr_host = _synthetic_refiner(scale_iters=1)
    smr_host.backend = "auto"
    smr_host.do_rough_rescale = False

    def degenerate_read():
        rd = _synthetic_read(rng, smr_dev, 60)
        # one enormous stay in the middle -> band width >> device cap
        m = rd.seq_to_sig_map.copy()
        mid = len(m) // 2
        stretch = int(REFINE_DEVICE_MAX_BAND * 3)
        pad_sig = np.full(stretch, rd.dacs[int(m[mid])])
        rd.dacs = np.concatenate(
            [rd.dacs[: m[mid]], pad_sig, rd.dacs[m[mid]:]]
        )
        m[mid:] = m[mid:] + stretch
        rd.seq_to_sig_map = m
        rd._reset_cache()
        return rd

    rng = np.random.default_rng(10)
    rd_dev = degenerate_read()
    rng = np.random.default_rng(10)
    rd_host = degenerate_read()

    errs = smr_dev.refine_reads_batch([rd_dev])
    assert errs == [None]
    rd_host.refine_signal_mapping(smr_host)
    assert np.array_equal(rd_dev.seq_to_sig_map, rd_host.seq_to_sig_map)
    assert rd_dev.shift == rd_host.shift
    assert rd_dev.scale == rd_host.scale


def test_refine_reads_batch_multi_device_identical(monkeypatch):
    """Multi-device refine (VERDICT r4 #3): bucket launches round-robin
    over the 8-virtual-device mesh and split dominant buckets, yet the
    refined mappings are identical to a single-device run (per-read
    independence; rescale order is pinned bucket-major)."""
    import numpy as np

    rng = np.random.default_rng(29)
    smr = _synthetic_refiner(scale_iters=1)
    # mixed widths -> multiple pow-2 buckets; plus enough same-width
    # reads that the dominant-bucket split path runs too
    reads = [
        _synthetic_read(rng, smr, n)
        for n in (120, 200, 80, 150, 130, 140, 90, 160, 110)
    ]
    np.random.seed(1234)
    multi = [rd.copy() for rd in reads]
    monkeypatch.setenv("REMORA_TPU_REFINE_DP", "8")
    errs = smr.refine_reads_batch(multi)
    assert errs == [None] * len(reads)

    np.random.seed(1234)
    single = [rd.copy() for rd in reads]
    monkeypatch.setenv("REMORA_TPU_REFINE_DP", "1")
    errs = smr.refine_reads_batch(single)
    assert errs == [None] * len(reads)

    for a, b in zip(multi, single):
        assert a.shift == b.shift and a.scale == b.scale
        assert np.array_equal(a.seq_to_sig_map, b.seq_to_sig_map)


def test_refine_dp_env_validation(monkeypatch):
    """Bad REMORA_TPU_REFINE_DP fails fast (RemoraError), matching the
    REMORA_TPU_INFER_DP contract, instead of silently degrading every
    batch to the host DP."""
    import pytest

    from remora_tpu import RemoraError

    rng = np.random.default_rng(31)
    smr = _synthetic_refiner(scale_iters=0)
    reads = [_synthetic_read(rng, smr, 80)]

    monkeypatch.setenv("REMORA_TPU_REFINE_DP", "all")
    with pytest.raises(RemoraError, match="not an integer"):
        smr.refine_reads_batch([rd.copy() for rd in reads])

    monkeypatch.setenv("REMORA_TPU_REFINE_DP", "9999")
    with pytest.raises(RemoraError, match="local devices"):
        smr.refine_reads_batch([rd.copy() for rd in reads])


def test_dp_tb_budget_accounting(monkeypatch):
    """_dp_tb_bytes models one 128-read lane tile exactly (launches are
    chunked to <=128 reads), and the budget env knob is respected."""
    from remora_tpu.refine.refiner import (
        _DP_LAUNCH_LANES,
        _dp_tb_budget_bytes,
        _dp_tb_bytes,
    )

    # 6000 bases pad to 6144, width 3000 buckets to 4096, 128 lanes i16
    assert _dp_tb_bytes(6000, 3000) == 6144 * 4096 * 128 * 2
    # floor clamps: 1 base -> 256 rows, width below 16 -> bucket 16
    assert _dp_tb_bytes(1, 1) == 256 * 16 * 128 * 2
    assert _DP_LAUNCH_LANES == 128

    monkeypatch.setenv("REMORA_TPU_DP_TB_BUDGET_MB", "123")
    assert _dp_tb_budget_bytes() == 123 * 1024 * 1024


def test_refine_launches_chunk_to_lane_tiles(monkeypatch):
    """More same-bucket reads than one 128-lane tile still refine
    correctly: launches chunk to <=128 reads so the traceback budget
    accounting stays exact (results identical to the per-read path)."""
    import pytest

    rng = np.random.default_rng(37)
    smr = _synthetic_refiner(scale_iters=0)
    # tiny reads keep the interpret-mode DP cheap; 130 same-width reads
    # force one bucket to span two lane-tile chunks
    reads = [_synthetic_read(rng, smr, 30) for _ in range(130)]
    batch = [rd.copy() for rd in reads]
    errs = smr.refine_reads_batch(batch)
    assert errs == [None] * len(reads)
    for rd, orig in zip(batch, reads):
        single = orig.copy()
        single.refine_signal_mapping(smr)
        assert np.array_equal(single.seq_to_sig_map, rd.seq_to_sig_map)


def test_refine_dp_outstanding_budget_drain(monkeypatch):
    """A tiny REMORA_TPU_DP_TB_BUDGET_MB forces the dispatch loop to
    drain pending launches mid-flight (the outstanding-bytes bound);
    results must be identical to an unconstrained run."""
    rng = np.random.default_rng(41)
    smr = _synthetic_refiner(scale_iters=0)
    reads = [
        _synthetic_read(rng, smr, n) for n in (60, 90, 75, 80, 70, 85)
    ]
    # per-launch tensors here are ~256*128*128*2 = 8.4MB; a 9MB budget
    # on a single device admits one launch at a time, draining pending
    # results before every dispatch (8 devices would spread the buckets
    # and never exercise the mid-loop drain)
    monkeypatch.setenv("REMORA_TPU_REFINE_DP", "1")
    monkeypatch.setenv("REMORA_TPU_DP_TB_BUDGET_MB", "9")
    tight = [rd.copy() for rd in reads]
    errs = smr.refine_reads_batch(tight)
    assert errs == [None] * len(reads)

    monkeypatch.delenv("REMORA_TPU_DP_TB_BUDGET_MB")
    free = [rd.copy() for rd in reads]
    errs = smr.refine_reads_batch(free)
    assert errs == [None] * len(reads)
    for a, b in zip(tight, free):
        assert np.array_equal(a.seq_to_sig_map, b.seq_to_sig_map)
