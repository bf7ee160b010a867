"""Refinement-enabled ETL: estimate a levels table from the test data,
then prepare a dataset with rough rescale + DP refinement enabled."""

import numpy as np
import pytest

DATA = "/root/reference/tests/data"


# levels_table is a session fixture in conftest.py (shared with the
# drift-characterization suite)


def test_levels_table_complete(levels_table):
    lines = open(levels_table).read().splitlines()
    assert len(lines) == 64
    vals = [float(ln.split()[1]) for ln in lines]
    assert np.isfinite(vals).all()


@pytest.fixture(scope="session")
def refined_chunks(tmpdir_factory, levels_table):
    from remora_tpu.core.seq import Motif
    from remora_tpu.prepare import extract_chunk_dataset
    from remora_tpu.refine.refiner import SigMapRefiner

    smr = SigMapRefiner(
        kmer_model_filename=levels_table,
        do_rough_rescale=True,
        scale_iters=1,
        do_fix_guage=True,
    )
    out = tmpdir_factory.mktemp("refined") / "refined_chunks"
    extract_chunk_dataset(
        bam_path=f"{DATA}/can_mappings.bam",
        pod5_path=f"{DATA}/can_reads.pod5",
        out_path=str(out),
        mod_base=None,
        mod_base_control=True,
        motifs=[Motif("CG", 0)],
        focus_ref_pos=None,
        chunk_context=(200, 200),
        min_samps_per_base=5,
        max_chunks_per_read=15,
        pa_scaling=None,
        sig_map_refiner=smr,
        kmer_context_bases=(4, 4),
        base_start_justify=False,
        offset=0,
        num_reads=None,
    )
    return out


def test_refined_prepare(refined_chunks):
    from remora_tpu.data.dataset import CoreDataset

    ds = CoreDataset(str(refined_chunks))
    assert ds.size > 150
    smr = ds.metadata.sig_map_refiner
    assert smr.is_loaded
    assert smr.do_rough_rescale
    assert smr.scale_iters == 1
    assert smr.kmer_len == 3
    assert smr.levels_array.size == 64
    # gauge-fixed levels ~N(0,1)-ish
    assert abs(float(np.median(smr.levels_array))) < 0.2


def test_refined_metadata_roundtrip(refined_chunks):
    from remora_tpu.data.dataset import CoreDataset

    ds1 = CoreDataset(str(refined_chunks))
    ds2 = CoreDataset(str(refined_chunks))
    assert ds1.metadata.sig_map_refiner == ds2.metadata.sig_map_refiner
    # batches are well formed after refinement
    ds1.batch_size = 16
    batch = next(iter(ds1))
    assert batch["signal"].shape == (16, 1, 400)
    assert np.isfinite(batch["signal"]).all()


def test_basecall_anchored_prepare(tmpdir_factory):
    from remora_tpu.core.seq import Motif
    from remora_tpu.data.dataset import CoreDataset
    from remora_tpu.prepare import extract_chunk_dataset
    from remora_tpu.refine.refiner import SigMapRefiner

    out = tmpdir_factory.mktemp("bc_anchor") / "chunks"
    extract_chunk_dataset(
        bam_path=f"{DATA}/can_mappings.bam",
        pod5_path=f"{DATA}/can_reads.pod5",
        out_path=str(out),
        mod_base=None,
        mod_base_control=True,
        motifs=[Motif("CG", 0)],
        focus_ref_pos=None,
        chunk_context=(200, 200),
        min_samps_per_base=5,
        max_chunks_per_read=10,
        pa_scaling=None,
        sig_map_refiner=SigMapRefiner(),
        kmer_context_bases=(4, 4),
        base_start_justify=False,
        offset=0,
        num_reads=None,
        basecall_anchor=True,
    )
    ds = CoreDataset(str(out))
    assert ds.size > 50


def test_focus_bed_prepare(tmpdir_factory):
    from remora_tpu.core.seq import Motif
    from remora_tpu.data.dataset import CoreDataset
    from remora_tpu.io.refregion import parse_bed
    from remora_tpu.prepare import extract_chunk_dataset
    from remora_tpu.refine.refiner import SigMapRefiner

    focus = parse_bed(f"{DATA}/can_gt.bed")
    out = tmpdir_factory.mktemp("bed_focus") / "chunks"
    extract_chunk_dataset(
        bam_path=f"{DATA}/can_mappings.bam",
        pod5_path=f"{DATA}/can_reads.pod5",
        out_path=str(out),
        mod_base=None,
        mod_base_control=True,
        motifs=[Motif("CG", 0)],
        focus_ref_pos=focus,
        chunk_context=(200, 200),
        min_samps_per_base=5,
        max_chunks_per_read=50,
        pa_scaling=None,
        sig_map_refiner=SigMapRefiner(),
        kmer_context_bases=(4, 4),
        base_start_justify=False,
        offset=0,
        num_reads=None,
    )
    ds = CoreDataset(str(out))
    assert ds.size > 0


def test_pallas_lstm_interpret():
    """Fused Pallas LSTM: value AND gradient parity vs the XLA scan."""
    import jax
    import jax.numpy as jnp

    from remora_tpu.kernels.pallas_lstm import lstm_fused
    from remora_tpu.models import layers as L

    T, B, H = 12, 8, 64
    params = L.lstm_init(jax.random.PRNGKey(0), H, H)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    probe = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

    ref = np.asarray(L.lstm(params, x, impl="scan"))
    out = np.asarray(lstm_fused(params, x, interpret=True))
    assert np.allclose(ref, out, atol=1e-5)

    def loss(fn):
        return lambda p, xx: jnp.sum(fn(p, xx) * probe)

    ref_g = jax.grad(loss(lambda p, xx: L.lstm(p, xx, impl="scan")),
                     argnums=(0, 1))(params, x)
    out_g = jax.grad(
        loss(lambda p, xx: lstm_fused(p, xx, interpret=True)),
        argnums=(0, 1),
    )(params, x)
    for r, o in zip(jax.tree.leaves(ref_g), jax.tree.leaves(out_g)):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(o), rtol=1e-4, atol=1e-4
        )


def test_pallas_lstm_interpret_multitile(monkeypatch):
    """Parity across MULTIPLE batch tiles and time chunks (exercises the
    thin previous-chunk h/c slices in the backward)."""
    import jax
    import jax.numpy as jnp

    from remora_tpu.kernels import pallas_lstm as PL
    from remora_tpu.models import layers as L

    # force small tiles so B=256 splits into 128-wide batch tiles
    monkeypatch.setattr(
        PL, "_tile_plan", lambda *a, **k: (128, 8)
    )
    T, B, H = 21, 256, 64  # multi-tile, multi-chunk (NC = 3)

    params = L.lstm_init(jax.random.PRNGKey(1), H, H)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    probe = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

    ref = np.asarray(L.lstm(params, x, impl="scan"))
    out = np.asarray(PL.lstm_fused(params, x, interpret=True))
    assert np.allclose(ref, out, atol=1e-5)

    def loss(fn):
        return lambda p, xx: jnp.sum(fn(p, xx) * probe)

    ref_g = jax.grad(loss(lambda p, xx: L.lstm(p, xx, impl="scan")),
                     argnums=(0, 1))(params, x)
    out_g = jax.grad(
        loss(lambda p, xx: PL.lstm_fused(p, xx, interpret=True)),
        argnums=(0, 1),
    )(params, x)
    for r, o in zip(jax.tree.leaves(ref_g), jax.tree.leaves(out_g)):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(o), rtol=1e-4, atol=1e-4
        )


def _prepare_with_backend(tmpdir_factory, levels_table, backend, tag):
    from remora_tpu.core.seq import Motif
    from remora_tpu.prepare import extract_chunk_dataset
    from remora_tpu.refine.refiner import SigMapRefiner

    smr = SigMapRefiner(
        kmer_model_filename=levels_table,
        do_rough_rescale=True,
        scale_iters=1,
        do_fix_guage=True,
        backend=backend,
    )
    out = tmpdir_factory.mktemp(f"refined_{tag}") / "chunks"
    extract_chunk_dataset(
        bam_path=f"{DATA}/can_mappings.bam",
        pod5_path=f"{DATA}/can_reads.pod5",
        out_path=str(out),
        mod_base=None,
        mod_base_control=True,
        motifs=[Motif("CG", 0)],
        focus_ref_pos=None,
        chunk_context=(100, 100),
        min_samps_per_base=5,
        # no focus-base downsampling: it draws from the global NumPy RNG,
        # whose stream differs between the forked host worker and the
        # in-process device stage (sampling nondeterminism, not DP drift)
        max_chunks_per_read=100_000,
        pa_scaling=None,
        sig_map_refiner=smr,
        kmer_context_bases=(2, 2),
        base_start_justify=False,
        offset=0,
        num_reads=1,
        skip_shuffle=True,
    )
    return out


def test_prepare_device_refine_backend_matches_host(
    tmpdir_factory, levels_table
):
    """E2E: `--refine-backend device` routes dataset prepare through the
    batched Pallas DP stage (interpret mode off-TPU) and produces a
    bit-identical dataset to the host backend (scale_iters=1 is the
    host-exact single-round path)."""
    from remora_tpu.data.dataset import CoreDataset

    host = _prepare_with_backend(tmpdir_factory, levels_table, "auto", "host")
    dev = _prepare_with_backend(tmpdir_factory, levels_table, "device", "dev")
    ds_h = CoreDataset(str(host))
    ds_d = CoreDataset(str(dev))
    assert ds_d.size == ds_h.size and ds_h.size > 0
    for name in ("signal", "sequence", "sequence_to_signal_mapping",
                 "sequence_lengths", "labels"):
        a = getattr(ds_h, name)[: ds_h.size]
        b = getattr(ds_d, name)[: ds_d.size]
        assert np.array_equal(a, b), name


def test_prepare_numpy_refine_backend_matches_native(
    tmpdir_factory, levels_table
):
    """E2E: `--refine-backend numpy` == native through real dataset
    prepare. Regression guard for the NumPy DP's f32 association (its
    former min-plus formulation could flip rare wide-band ties)."""
    from remora_tpu.data.dataset import CoreDataset

    nat = _prepare_with_backend(tmpdir_factory, levels_table, "native",
                                "nat")
    npy = _prepare_with_backend(tmpdir_factory, levels_table, "numpy",
                                "npy")
    ds_a = CoreDataset(str(nat))
    ds_b = CoreDataset(str(npy))
    assert ds_a.size == ds_b.size and ds_a.size > 0
    for name in ("signal", "sequence", "sequence_to_signal_mapping",
                 "sequence_lengths", "labels"):
        a = getattr(ds_a, name)[: ds_a.size]
        b = getattr(ds_b, name)[: ds_b.size]
        assert np.array_equal(a, b), name


def test_pallas_lstm_last_only_interpret(monkeypatch):
    """Inference-only last-timestep kernel == lstm(...)[-1], including a
    ragged time tail (T not a multiple of the time chunk) where padding
    steps must not clobber the final real h."""
    import jax
    import jax.numpy as jnp

    from remora_tpu.kernels import pallas_lstm as PL
    from remora_tpu.models import layers as L

    monkeypatch.setattr(PL, "_tile_plan", lambda *a, **k: (128, 8))
    for T in (21, 24, 7):  # ragged tail, exact multiple, single chunk
        B, H = 256, 64
        params = L.lstm_init(jax.random.PRNGKey(2), H, H)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
        ref = np.asarray(L.lstm(params, x, impl="scan"))[-1]
        out = np.asarray(PL.lstm_last_fused(params, x, interpret=True))
        assert out.shape == (B, H)
        assert np.allclose(ref, out, atol=1e-5), T
