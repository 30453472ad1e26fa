"""Execute parallel/distributed.py for real: 2 OS processes, one coordinator.

SURVEY §2.3's communication backend (jax.distributed + XLA collectives) has
no reference counterpart (the reference is single-GPU); this test retires the
"unexecuted code path" risk by running `initialize()` + `global_mesh()` +
`local_batch_slice()` + one cross-process psum on a 2-process CPU cluster
(localhost coordinator), asserting both processes see process_count == 2 and
compute the correct global sum.
"""

import os
import socket
import subprocess
import sys

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_initialize_and_psum(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            # Disable the axon TPU plugin for the children (it registers at
            # interpreter start from sitecustomize; the empty pool-IPs list
            # turns it off). Two processes must not race for the real chip.
            "PALLAS_AXON_POOL_IPS": "",
            # 2 virtual CPU devices per process -> a 4-device global mesh.
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        }
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = str(tmp_path / "dist_ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "tests._distributed_child",
                str(i), str(port), ckpt_dir,
            ],
            cwd=repo,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        # 4 devices, values 1..4 -> global psum 10.
        assert f"OK {i} 10.0" in out, f"process {i} output:\n{out}"
        # Cross-process train step + orbax checkpoint round-trip: the resumed
        # step's metrics must equal the uninterrupted run's on BOTH processes.
        assert f"CKPT {i} match" in out, f"process {i} output:\n{out}"
