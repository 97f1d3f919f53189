"""Real 2-process ``jax.distributed`` test on the CPU backend.

The reference's multi-process layer is mpi4py (`mpi_fork` re-exec +
allreduce, safe_rl_libX/guard_utils/mpi_tools.py:6-36, mpi_pytorch.py:20-35)
and is never tested with >1 process. Here two actual OS processes join a
coordination service (gloo CPU collectives), verify the global topology,
run a cross-process device collective, and check `host_seed` decorrelation
(the reference's ``seed += 10000 * proc_id()``, cpo/cpo.py:340).

Runs in subprocesses so the parent's already-initialized JAX backend is
untouched.
"""

import os
import re
import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent("""
    import os, sys
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')

    pid, port = int(sys.argv[1]), sys.argv[2]
    from guardx_tpu.parallel import init_distributed, host_seed

    assert not jax.distributed.is_initialized()
    init_distributed(f'127.0.0.1:{port}', num_processes=2, process_id=pid)
    assert jax.distributed.is_initialized()
    init_distributed(f'127.0.0.1:{port}', 2, pid)  # idempotent no-op

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    # cross-process device collective: broadcast process 0's value
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    x = multihost_utils.broadcast_one_to_all(
        jnp.float32(jax.process_index() + 41.0)
    )
    key = host_seed(0)
    print(f'RESULT pid={pid} bcast={float(x)} key={key.tolist()}', flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_init_and_collective(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    # a fresh backend per child; drop the parent's virtual-device XLA flag
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) bcast=([\d.]+) key=(\[.*?\])", out)
        assert m, f"no RESULT line in:\n{out}"
        results[int(m.group(1))] = (float(m.group(2)), m.group(3))

    # broadcast_one_to_all: both processes hold process 0's value
    assert results[0][0] == 41.0
    assert results[1][0] == 41.0
    # host_seed folds process_index into the key -> decorrelated streams
    assert results[0][1] != results[1][1]
