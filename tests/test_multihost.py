"""True multi-process distributed sweep (2 processes x 4 virtual devices)."""

import pathlib
import socket
import subprocess
import sys

import pytest

DEMO = pathlib.Path(__file__).resolve().parents[1] / "tools" / "multihost_demo.py"


@pytest.mark.slow
def test_two_process_distributed_sweep():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    procs = [subprocess.Popen(
        [sys.executable, str(DEMO), "worker", coord, "2", str(i), "4"],
        stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
        stderr=subprocess.STDOUT) for i in range(2)]
    out = procs[0].communicate(timeout=420)[0].decode()
    assert all(p.wait(timeout=420) == 0 for p in procs), out
    assert "MULTIHOST_OK procs=2 devices=8" in out
