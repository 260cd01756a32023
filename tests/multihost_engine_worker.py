"""Worker for the 2-process serving-engine test (not collected by pytest).

Each instance is one "host" of a 2-process x 2-virtual-device cluster.  The
continuous-batching engine runs SPMD over the global 4-device mesh with the
weights + KV cache tensor-sharded over the ``model`` axis — TP collectives
cross the process boundary (the DCN stand-in for multi-host serving;
BASELINE config 5).  Every process submits the same deterministic request
stream and must produce identical completions.

Usage: python multihost_engine_worker.py <coordinator> <num> <pid> <outdir>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onnx_transformer_tpu import Transformer, TransformerConfig  # noqa: E402
from onnx_transformer_tpu.parallel.mesh import (  # noqa: E402
    initialize_distributed,
    make_mesh,
)
from onnx_transformer_tpu.serving.engine import TranslationEngine  # noqa: E402


def main(coordinator: str, num: int, pid: int, outdir: str) -> None:
    initialize_distributed(coordinator, num_processes=num, process_id=pid)
    assert len(jax.devices()) == 2 * num
    mesh = make_mesh(data=1, model=2 * num)

    cfg = TransformerConfig(src_vocab_size=37, tgt_vocab_size=31,
                            num_layers=2, d_model=32, d_ff=64, num_heads=4,
                            dropout=0.0)
    model = Transformer(cfg)
    params = model.init(jax.random.key(3))   # identical on every process

    S, T = 8, 10
    eng = TranslationEngine(model, params, num_slots=4, src_len=S, max_len=T,
                            chunk_steps=3, mesh=mesh)
    rng = np.random.default_rng(11)          # identical stream everywhere
    src = rng.integers(4, cfg.src_vocab_size, (10, S)).astype(np.int32)
    src[2, -3:] = cfg.pad_id
    for row in src:
        eng.submit(row)
    done = eng.run()
    out = {str(r.req_id): r.out_tokens for r in done}
    with open(os.path.join(outdir, f"engine{pid}.json"), "w") as f:
        json.dump({"outputs": out, "n_done": len(done)}, f)
    print(f"worker {pid}: engine completed {len(done)} requests")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
