#!/usr/bin/env python
"""Multi-process launcher — the dist_train.sh / dist_test.sh equivalent.

The reference launches one worker per GPU through
`torch.distributed.launch` (/root/reference/tools/dist_train.sh:9-11,
dist_test.sh:10-13). Here the same one-command shape spawns N local
processes wired to a localhost `jax.distributed` coordinator:

    python tools/launch.py --nprocs 2 -- python tools/test.py --task davis ...
    bash tools/dist_train.sh 2 --synthetic --max-steps 4 ...

Per-rank coordinates travel as FGVC_COORDINATOR / FGVC_NUM_PROCESSES /
FGVC_PROCESS_ID env vars. `fgvc-train` and `fgvc-test` pick them up via
`parallel.dist.initialize_from_flags`; any user script can do the same
(call `initialize_from_flags()` before touching jax devices). Other
entry points (demo/serve/reproduce) are single-process by design — the
launcher would just run N uncoordinated copies of them.

Scope: multi-process runs on ONE machine — CPU-mesh rehearsal of the
multi-host protocol, or hosts with several local chips. On real TPU pods
the infrastructure starts one process per host and
`jax.distributed.initialize()` autodetects; this launcher is not needed
there.
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(nprocs: int, command: list, port: int = 0) -> int:
    """Spawn `command` nprocs times with FGVC_* rank env vars; returns the
    first nonzero exit code (terminating the stragglers), else 0."""
    if not command:
        raise ValueError("no command given (separate it with `--`)")
    port = port or _free_port()
    procs = []
    for rank in range(nprocs):
        env = dict(os.environ)
        env["FGVC_COORDINATOR"] = f"localhost:{port}"
        env["FGVC_NUM_PROCESSES"] = str(nprocs)
        env["FGVC_PROCESS_ID"] = str(rank)
        # interleaved stdio like torch.distributed.launch; rank in env lets
        # the child prefix its own logs if it wants to
        procs.append(subprocess.Popen(command, env=env))
    code = 0
    # preemption pass-through: cluster managers SIGTERM the launcher, but
    # the graceful-stop handler lives in the WORKERS (apis/train.py
    # train_model: checkpoint at the step boundary + multi-host stop
    # agreement) — forward the signal to every live rank and keep waiting
    # for their clean exits
    def _forward_sigterm(signum, frame):
        for q in procs:
            if q.poll() is None:
                q.send_signal(signal.SIGTERM)

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _forward_sigterm)
    except ValueError:  # not the main thread
        prev_sigterm = None
    try:
        # poll ALL workers (torch.distributed.launch-style): a crash in ANY
        # rank terminates the rest immediately — an ordered wait would sit
        # on rank 0 (blocked in initialize) while a later rank lies dead
        import time

        live = list(procs)
        while live:
            for p in list(live):
                rc = p.poll()
                if rc is None:
                    continue
                live.remove(p)
                if rc != 0 and code == 0:
                    code = rc
                    for q in procs:
                        if q.poll() is None:
                            q.terminate()
            if live:
                time.sleep(0.2)
    except KeyboardInterrupt:
        for q in procs:
            if q.poll() is None:
                q.send_signal(signal.SIGINT)
        for q in procs:
            q.wait()
        code = 130
    finally:
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
    return code


def main():
    p = argparse.ArgumentParser(
        description="launch N coordinated processes (dist_train.sh equivalent)",
        usage="launch.py --nprocs N [--port P] -- COMMAND [ARGS...]",
    )
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--port", type=int, default=0,
                   help="coordinator port (default: pick a free one)")
    args, rest = p.parse_known_args()
    if rest and rest[0] == "--":
        rest = rest[1:]
    sys.exit(launch(args.nprocs, rest, port=args.port))


if __name__ == "__main__":
    main()
