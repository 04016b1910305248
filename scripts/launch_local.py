#!/usr/bin/env python3
"""Spawn N local processes of scripts/train.py joined into one
multi-process JAX runtime — the analog of the reference's Lightning
`ddp_spawn` (configs/trainer/ddp_sim.yaml:4-8: "simulate DDP on CPU,
useful for debugging").

Usage:
    python scripts/launch_local.py -n 2 -- experiment=X trainer=mp_sim ...

Each child gets GENNERF_COORDINATOR / GENNERF_NUM_PROCESSES /
GENNERF_PROCESS_ID; scripts/train.py's select_platform joins them via
jax.distributed.initialize (parallel/distributed.py). Child 0's output
streams through; the launcher exits non-zero if any child fails.
"""
import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main(argv=None):
    parser = argparse.ArgumentParser(description="local multi-process launcher")
    parser.add_argument("-n", "--num-processes", type=int, default=2)
    parser.add_argument("args", nargs=argparse.REMAINDER,
                        help="arguments for scripts/train.py (prefix with --)")
    ns = parser.parse_args(argv)
    train_args = [a for a in ns.args if a != "--"]

    coordinator = f"localhost:{free_port()}"
    procs = []
    for pid in range(ns.num_processes):
        env = dict(os.environ)
        env.update(
            GENNERF_COORDINATOR=coordinator,
            GENNERF_NUM_PROCESSES=str(ns.num_processes),
            GENNERF_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "train.py"),
             f"trainer.num_nodes={ns.num_processes}", *train_args],
            env=env,
            stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=None if pid == 0 else subprocess.STDOUT,
        ))
    rc = 0
    for p in procs:
        rc = p.wait() or rc
    return rc


if __name__ == "__main__":
    sys.exit(main())
