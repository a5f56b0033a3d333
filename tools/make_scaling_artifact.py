"""Assemble SCALING_r{N}.json: sync strong/weak + mega strong/weak curves.

Runs tools/scaling_curve.py four times IN SEQUENCE (the virtual CPU mesh
shares one physical core — concurrent runs would poison each other's
timings) and writes the combined artifact. The mega rows are the round-4
verdict 2b requirement: the production multi-device topology (row bands,
banded no-collective film) measured next to the sync driver.

Usage: python tools/make_scaling_artifact.py <round> [out.json]
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(mode: str, topo: str) -> dict:
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=REPO,
    )
    cmd = [
        sys.executable,
        os.path.join(HERE, "scaling_curve.py"),
        "--mode", mode, "--topology", topo,
    ]
    print(f"== {topo} {mode}", file=sys.stderr, flush=True)
    out = subprocess.run(
        cmd, env=env, check=True, stdout=subprocess.PIPE, text=True
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    rnd = int(sys.argv[1])
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, f"SCALING_r{rnd:02d}.json"
    )
    art = {
        "round": rnd,
        "note": (
            "sync (XLA block-sharded, psum_scatter row-banded film when "
            "height % N == 0) and mega (production row-band topology, "
            "banded no-collective film with ppermute halo exchange) "
            "measured at HEAD on the virtual CPU mesh; film equality vs "
            "single-device asserted at every N in all four runs"
        ),
    }
    art["strong"] = run("strong", "sync")
    art["weak"] = run("weak", "sync")
    art["mega_strong"] = run("strong", "mega")
    art["mega_weak"] = run("weak", "mega")
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
