"""Multi-host data parallelism on a 2-process CPU "pod".

The reference scales to the local GPUs of one machine only
(/root/reference/model/model_util/distributer.py:9-44). The TPU-native
design goes past a host with the JAX multi-controller recipe
(parallel/multihost.py); these tests prove it WITHOUT pod hardware by
coupling two subprocesses (4 virtual CPU devices each, Gloo
collectives) into one 8-device mesh and comparing against the
single-process 8-device result computed in this process.

Workers live in tests/mh_worker.py (subprocesses must configure JAX
before import, so the logic cannot run in-process here).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "mh_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_pod(mode: str, num_processes: int, devs_per_proc: int,
               extra: list[str], timeout: float = 1800.0) -> list[str]:
    """Run one pod of ``num_processes`` workers to completion; returns
    each worker's marker line (MHLOSS/MHPLAN ...)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # worker forces CPU in-process
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), mode, str(pid),
             str(num_processes), str(port), str(devs_per_proc), *extra],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(num_processes)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    markers = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {pid} rc={p.returncode}\n{out[-4000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("MH")]
        assert lines, f"worker {pid} printed no marker\n{out[-4000:]}"
        markers.append(lines[-1])
    return markers


@pytest.mark.slow
def test_two_process_step_matches_single_process():
    """One DP train step over 2 hosts x 4 devices == 1 host x 8 devices
    (same global batch, same init): the process-local batch assembly
    and host-major mesh change nothing about the math."""
    from mh_worker import reference_loss

    # parent's conftest-provided 8-device backend
    ref_loss, ref_sum = reference_loss()
    markers = _spawn_pod("step", 2, 4, [])
    losses, sums = [], []
    for m in markers:
        assert m.startswith("MHLOSS "), m
        losses.append(float(m.split()[1]))
        sums.append(float(m.split()[2]))
    # replicated metric: every host agrees bit-for-bit
    assert losses[0] == losses[1]
    # the assembled GLOBAL batch is exactly the single-process batch
    # (catches row misplacement in the local->global mapping)
    np.testing.assert_allclose(sums, ref_sum, rtol=1e-6)
    # loss matches loosely: the 2-process executable fuses/reduces in a
    # different order than the single-process one, and the depth
    # reciprocal amplifies f32 noise (measured ~2.6e-4 relative)
    np.testing.assert_allclose(losses[0], ref_loss, rtol=2e-3)


@pytest.mark.slow
def test_two_process_train_by_plan(tmp_path):
    """Full plan walk on the pod: per-process loader slicing, global
    batch assembly, main-process-only checkpoint/log IO."""
    markers = _spawn_pod("plan", 2, 4, [str(tmp_path)])
    main = [m for m in markers if m != "MHPLAN done"]
    assert len(main) == 1 and main[0].startswith("MHPLAN "), markers
    assert np.isfinite(float(main[0].split()[1]))
    ckpt = tmp_path / "checkpts" / "mh"
    assert (ckpt / "history.csv").exists()
    assert (ckpt / "trainstate_latest.msgpack").exists()
