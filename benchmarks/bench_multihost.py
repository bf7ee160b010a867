"""Multihost DP scaling harness: chunks/s at 1 vs 2 processes.

Runs the REAL multihost path (jax.distributed over gloo, per-process
dataset stripes, make_array_from_process_local_data) on virtual CPU
devices — the same code path a TPU pod slice runs over ICI/DCN, so this
measures the input-pipeline + collective overhead of the scale-out
design. Reports scaling efficiency = throughput(2 proc) / throughput(1
proc) (target >= 0.8, BASELINE.md).

Methodology (pinned; VERDICT r4 #8): the 1-proc and 2-proc legs run
INTERLEAVED for --trials rounds (1,2,1,2,…) so host-load drift hits
both legs equally; per-trial efficiencies are reported with min/median/
max, and the HEADLINE efficiency is median capped at 1.0 — on a 4-core
CPU host, apparent super-linearity is measurement noise (per-host input
sharding halves each process's serial input time, which a real pod also
enjoys, but >1.0 is not a defensible scaling claim). --out-json commits
the full record (per-trial throughputs, spread, env) as an artifact.

Usage: python -m benchmarks.bench_multihost --dataset <prepared chunks dir>
       (defaults to preparing a dataset from the bundled test data)
"""

import argparse
import json
import os
import socket
import statistics
import subprocess
import sys
import tempfile

_WORKER = r"""
import sys, time, os
pid, port, nproc, ds_path, nsteps, batch = (
    int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), sys.argv[4],
    int(sys.argv[5]), int(sys.argv[6]),
)
sys.path.insert(0, os.getcwd())
import jax
jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )
import numpy as np
import optax
from remora_tpu.data.dataset import (
    ComposedDataset, CoreDataset, shard_for_process,
)
from remora_tpu.models.registry import get_model
from remora_tpu.parallel import mesh as M

local_batch = batch // nproc
ds = ComposedDataset(
    [CoreDataset(ds_path, override_metadata={"chunk_context": (50, 50)})],
    np.ones(1), batch_size=local_batch, super_batch_size=1024,
)
# keep super batches a multiple of the local batch so every batch is full
sb = max(local_batch, min(1024, ds.size) // local_batch * local_batch)
ds.super_batch_size = sb
shard_for_process(ds, pid, nproc)
model = get_model("Conv_w_ref")
params, bn = model.init(
    jax.random.PRNGKey(0), size=16, kmer_len=ds.metadata.kmer_len,
    num_out=ds.metadata.num_labels,
)
tx = optax.adamw(1e-3)
opt = tx.init(params)
mesh = M.make_mesh()
step = M.make_dp_train_step(model, tx, mesh)
params, bn, opt = (M.replicate(mesh, t) for t in (params, bn, opt))
it = ds.iter_batches()

def one_step():
    local = next(it)
    gb = M.host_shard_to_global(mesh, {
        "signal": np.ascontiguousarray(local["signal"], np.float32),
        "enc_kmers": np.ascontiguousarray(local["enc_kmers"], np.float32),
        "labels": np.ascontiguousarray(local["labels"]),
    })
    return step(params, bn, opt, gb["signal"], gb["enc_kmers"], gb["labels"])

params, bn, opt, loss, _., _ = [*one_step()]  # warmup/compile
t0 = time.perf_counter()
for _ in range(nsteps):
    params, bn, opt, loss, _nf, _gm = one_step()
jax.block_until_ready(loss)
dt = time.perf_counter() - t0
if pid == 0:
    print(f"MH_RESULT nproc={nproc} chunks_per_s={nsteps * batch / dt:.1f}",
          flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(nproc, ds_path, nsteps, batch, devs_per_proc):
    worker = tempfile.NamedTemporaryFile(
        "w", suffix="_mh_worker.py", delete=False
    )
    worker.write(_WORKER.replace("_., _", "_nf, _gm"))
    worker.close()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devs_per_proc}",
        JAX_NUM_CPU_DEVICES=str(devs_per_proc),
    )
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker.name, str(pid), str(port), str(nproc),
             str(ds_path), str(nsteps), str(batch)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    result = None
    for p in procs:
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(out[-3000:])
        for line in out.splitlines():
            if line.startswith("MH_RESULT"):
                result = float(line.split("chunks_per_s=")[1])
    os.unlink(worker.name)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", help="prepared chunk dataset dir")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--devs-per-proc", type=int, default=4)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out-json", help="write the full record here")
    args = ap.parse_args()

    ds_path = args.dataset
    if ds_path is None:
        import numpy as np

        from remora_tpu.core.seq import Motif
        from remora_tpu.prepare import extract_chunk_dataset
        from remora_tpu.refine.refiner import SigMapRefiner

        data = "/root/reference/tests/data"
        out = tempfile.mkdtemp(prefix="mh_bench_") + "/chunks"
        extract_chunk_dataset(
            bam_path=f"{data}/can_mappings.bam",
            pod5_path=f"{data}/can_reads.pod5",
            out_path=out,
            mod_base=None,
            mod_base_control=True,
            motifs=[Motif("CG", 0)],
            focus_ref_pos=None,
            chunk_context=(50, 50),
            min_samps_per_base=5,
            max_chunks_per_read=100,
            pa_scaling=None,
            sig_map_refiner=SigMapRefiner(),
            kmer_context_bases=(4, 4),
            base_start_justify=False,
            offset=0,
            num_reads=None,
        )
        ds_path = out

    # same total device count in both legs: 1 proc x 2D vs 2 procs x D;
    # legs interleave per trial so load drift is shared
    ones, twos, effs = [], [], []
    for trial in range(args.trials):
        one = _run(
            1, ds_path, args.steps, args.batch, args.devs_per_proc * 2
        )
        two = _run(2, ds_path, args.steps, args.batch, args.devs_per_proc)
        ones.append(one)
        twos.append(two)
        effs.append(two / one)
        print(
            f"trial {trial + 1}: 1-proc {one:,.0f} chunks/s, "
            f"2-proc {two:,.0f} chunks/s, raw efficiency {two / one:.2f}",
            flush=True,
        )
    eff_med = statistics.median(effs)
    headline = min(eff_med, 1.0)
    record = {
        "metric": "multihost_scaling_efficiency",
        "value": round(headline, 3),
        "unit": "ratio (2-proc/1-proc chunks/s, capped at 1.0)",
        "target": 0.8,
        "trials": args.trials,
        "steps_per_trial": args.steps,
        "batch": args.batch,
        "devs_per_proc": args.devs_per_proc,
        "raw_efficiency": {
            "min": round(min(effs), 3),
            "median": round(eff_med, 3),
            "max": round(max(effs), 3),
        },
        "one_proc_chunks_per_s": [round(x, 1) for x in ones],
        "two_proc_chunks_per_s": [round(x, 1) for x in twos],
        "spread_frac_1proc": round((max(ones) - min(ones)) / max(ones), 3),
        "spread_frac_2proc": round((max(twos) - min(twos)) / max(twos), 3),
        "note": "virtual CPU devices over gloo; interleaved legs; "
        "super-linear raw values are host-scheduling noise plus per-host "
        "input sharding and are capped for the headline claim",
    }
    print(json.dumps(record), flush=True)
    if args.out_json:
        with open(args.out_json, "w") as fh:
            json.dump(record, fh, indent=1)


if __name__ == "__main__":
    main()
