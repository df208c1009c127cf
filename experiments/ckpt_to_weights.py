#!/usr/bin/env python
"""Convert an orbax training checkpoint (ckp_NNN) to a reference-format
weights.pt so any intermediate epoch can run through the eval protocol:

    python experiments/ckpt_to_weights.py experiments/runs/X/checkpoints/ckp_201 /tmp/w201.pt

Mirrors demo/train.py's end-of-training save (reference weights.pt,
ref demo/train.py:292-295), but from a mid-run state.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ckp, out = sys.argv[1], sys.argv[2]
    import orbax.checkpoint as ocp

    state = ocp.StandardCheckpointer().restore(os.path.abspath(ckp))
    params = state["params"] if "params" in state else state
    from sei_tpu.models.torch_io import flax_swinir_to_torch, save_torch_state

    save_torch_state(out, flax_swinir_to_torch(params))
    print("saved:", out, f"(epoch {state.get('epoch', '?')})")


if __name__ == "__main__":
    main()
