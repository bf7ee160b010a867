"""I/O layer tests against reference test data (BAM + POD5 codecs)."""

import numpy as np
import pytest

from remora_tpu.io.bam import BamWriter, FastBamScanner, decode_record
from remora_tpu.io.pod5 import (
    Pod5Reader,
    svb16_decode,
    svb16_encode,
    vbz_decode,
    vbz_encode,
)
from remora_tpu.io.read import extract_alignments, iter_signal
from remora_tpu.io.read_index import ReadIndexedBam, get_read_ids


def test_bam_scan(can_mappings):
    s = FastBamScanner(can_mappings)
    recs = list(s)
    assert len(recs) == 14
    r = recs[0]
    assert r.reference_name == "chr13"
    assert len(r.query_sequence) > 1000
    ref = r.get_reference_sequence()
    assert len(ref) == r.reference_length


def test_bam_record_roundtrip(can_mappings):
    s = FastBamScanner(can_mappings)
    for rec in s:
        body = rec.encode()[4:]
        r2 = decode_record(body, s.header)
        assert r2.query_name == rec.query_name
        assert r2.cigartuples == rec.cigartuples
        assert r2.query_sequence == rec.query_sequence
        for (t1, tc1, v1), (t2, tc2, v2) in zip(rec.tags, r2.tags):
            assert (t1, tc1) == (t2, tc2)
            if hasattr(v1, "size"):
                assert np.array_equal(v1, v2)
            else:
                assert v1 == v2


def test_bam_writer_roundtrip(can_mappings, tmp_path):
    s = FastBamScanner(can_mappings)
    recs = list(s)
    out = tmp_path / "out.bam"
    with BamWriter(out, s.header) as w:
        for rec in recs:
            w.write(rec)
    recs2 = list(FastBamScanner(out))
    assert len(recs2) == len(recs)
    assert all(
        a.query_sequence == b.query_sequence for a, b in zip(recs, recs2)
    )


def test_pod5_read(can_pod5):
    rdr = Pod5Reader(can_pod5)
    assert len(rdr) == 14
    assert rdr.sample_rate == 4000
    for read in rdr.reads():
        assert read.signal.size == read.num_samples
        assert read.signal.dtype == np.int16


def test_vbz_roundtrip():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 1000):
        sig = rng.integers(-500, 2000, n).astype(np.int16)
        assert np.array_equal(svb16_decode(svb16_encode(sig), n), sig)
        if n:
            assert np.array_equal(vbz_decode(vbz_encode(sig), n), sig)


def test_read_index(can_mappings):
    idx = ReadIndexedBam(str(can_mappings))
    assert idx.num_records == 14
    rid = idx.read_ids[0]
    aligns = list(idx.get_alignments(rid))
    assert len(aligns) >= 1
    assert aligns[0].query_name == rid


def test_signal_alignment_join(can_pod5, can_mappings):
    idx = ReadIndexedBam(str(can_mappings))
    n_joined = 0
    for read_err in iter_signal(str(can_pod5), num_reads=3):
        for io_read, err in extract_alignments(read_err, idx):
            assert err is None
            assert io_read.query_to_signal is not None
            assert io_read.query_to_signal.size == len(io_read.seq) + 1
            assert io_read.ref_to_signal.size == len(io_read.ref_seq) + 1
            # norm signal should look standardized
            ns = io_read.norm_signal
            assert abs(float(np.mean(ns))) < 0.5
            assert 0.5 < float(np.std(ns)) < 2.0
            n_joined += 1
    assert n_joined == 3


def test_plot_align_and_metric_region(tmp_path, can_pod5, can_mappings):
    """plot_align + plot_metric_at_ref_region produce non-trivial figures
    (reference analogs io.py:1294/1692)."""
    from remora_tpu.analyze.plot import (
        plot_align,
        plot_metric_at_ref_region,
    )
    from remora_tpu.analyze.regions import RegionIndexedBam
    from remora_tpu.core import coords
    from remora_tpu.io.pod5 import DatasetReader
    from remora_tpu.io.read import extract_alignments, iter_signal
    from remora_tpu.io.read_index import ReadIndexedBam
    from remora_tpu.io.refregion import RefRegion

    bam_idx = ReadIndexedBam(str(can_mappings))
    read_err = next(iter_signal(str(can_pod5), num_reads=1))
    io_read, err = next(iter(extract_alignments(read_err, bam_idx)))
    assert err is None
    io_read.ref_to_signal = coords.compute_ref_to_signal(
        io_read.query_to_signal, io_read.cigar
    )
    p = plot_align(io_read, 1000, 2000, out_path=tmp_path / "align.svg")
    assert p.stat().st_size > 10_000

    reg = RefRegion(ctg="chr13", strand="+", start=52310080, end=52310100)
    p2 = plot_metric_at_ref_region(
        reg,
        [(DatasetReader(str(can_pod5)), RegionIndexedBam(str(can_mappings)))],
        out_path=tmp_path / "metric.svg",
    )
    assert p2.stat().st_size > 10_000


def test_pod5_writer_roundtrip(tmp_path):
    """Pod5Writer output reads back bit-identically through Pod5Reader
    (signal DACs, calibration, read ids)."""
    import uuid

    import numpy as np

    from remora_tpu.io.pod5 import DatasetReader
    from remora_tpu.io.pod5_write import Pod5Writer

    rng = np.random.default_rng(3)
    path = tmp_path / "rt.pod5"
    w = Pod5Writer(str(path), sample_rate=5000)
    reads = []
    for _ in range(5):
        rid = str(uuid.uuid4())
        sig = rng.integers(-2000, 2000, rng.integers(50, 5000)).astype(
            np.int16
        )
        reads.append((rid, sig))
        w.add_read(rid, sig, calibration_offset=-12.5, calibration_scale=1 / 0.18)
    w.close()

    with DatasetReader(str(path)) as dr:
        got = {str(r.read_id): r for r in dr.reads()}
    assert set(got) == {rid for rid, _sig in reads}
    for rid, sig in reads:
        r = got[rid]
        assert np.array_equal(np.asarray(r.signal, np.int16), sig)
        cal = r.calibration
        assert abs(cal.offset - (-12.5)) < 1e-6
        assert abs(cal.scale - 1 / 0.18) < 1e-6
        assert r.sample_rate == 5000


def test_read_index_fetch_region(can_mappings):
    """ReadIndexedBam.fetch yields primary records overlapping a region,
    strand-filtered (reference io.ReadIndexedBam.fetch semantics)."""
    from remora_tpu.io.read_index import ReadIndexedBam

    idx = ReadIndexedBam(str(can_mappings))
    recs = list(idx.fetch("chr13", 52300000, 52320000))
    assert len(recs) > 0
    for r in recs:
        assert r.reference_name == "chr13"
        assert r.reference_start < 52320000 and r.reference_end > 52300000
    fwd = list(idx.fetch("chr13", 52300000, 52320000, strand="+"))
    rev = list(idx.fetch("chr13", 52300000, 52320000, strand="-"))
    assert len(fwd) + len(rev) == len(recs)
    assert all(f.is_forward for f in fwd)
    assert all(r.is_reverse for r in rev)
    assert list(idx.fetch("chrUnknown", 0, 1000)) == []


def test_mm_ml_roundtrip_fuzz():
    """Fuzz: format_mm_ml_tags output parsed back by the independent
    io.bam MM/ML parser recovers exactly the formatted calls."""
    import numpy as np

    from remora_tpu.core.tags import format_mm_ml_tags
    from remora_tpu.io.bam import BamRecord

    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    for trial in range(40):
        seq = "".join(rng.choice(bases, size=rng.integers(30, 300)))
        can_base = rng.choice(list("ACGT"))
        mod_bases = (
            ["m"] if trial % 3 == 0
            else (["27551"] if trial % 3 == 1 else ["m", "h"])
        )
        cand = [i for i, b in enumerate(seq) if b == can_base]
        if not cand:
            continue
        n = min(len(cand), int(rng.integers(1, 12)))
        poss = sorted(rng.choice(cand, size=n, replace=False).tolist())
        probs = rng.random((n, len(mod_bases))).astype(np.float64)
        mm, ml = format_mm_ml_tags(
            seq, poss, probs, mod_bases, str(can_base)
        )

        rec = BamRecord.__new__(BamRecord)
        rec.query_sequence = seq
        rec.flag = 0
        rec._tags = {"MM": mm, "ML": ml}
        rec.get_tag = lambda name, _t=rec: _t._tags[name]
        mb = BamRecord.modified_bases.fget(rec)
        assert mb is not None
        got_by_mod = {}
        for (cb, strand, mod), calls in mb.items():
            assert cb == can_base and strand == 0
            got_by_mod[mod] = calls
        assert set(got_by_mod) == set(mod_bases)
        for mi, mod in enumerate(mod_bases):
            got = got_by_mod[mod]
            assert [p for p, _q in got] == poss
            exp_quals = [int(np.floor(p * 256)) for p in probs[:, mi]]
            exp_quals = [min(q, 255) for q in exp_quals]
            assert [q for _p, q in got] == exp_quals, (mod, trial)
