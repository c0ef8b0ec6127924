"""Embedding projector export (reference: embeddings_to_tensorboard.py:13-22):
dump the embedding matrix + vocab words to the TensorBoard projector."""

from __future__ import annotations

import argparse
import os


def export_embeddings(model, variables, logdir: str = "logs/embeddings") -> str:
    import numpy as np
    import jax
    emb = np.asarray(jax.device_get(variables["params"]["decoder"]["embedding"]))
    words = [model.vocab.itos(i) for i in range(model.vocab.size)]
    os.makedirs(logdir, exist_ok=True)
    try:
        import torch
        from torch.utils.tensorboard import SummaryWriter
        w = SummaryWriter(log_dir=logdir)
        w.add_embedding(torch.tensor(emb), metadata=words)
        w.close()
    except Exception:
        # TSV fallback readable by projector.tensorflow.org
        np.savetxt(os.path.join(logdir, "embeddings.tsv"), emb, delimiter="\t")
        with open(os.path.join(logdir, "metadata.tsv"), "w") as f:
            f.write("\n".join(words))
    return logdir


def main(argv=None):
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    from ..train.checkpoints import load_any_checkpoint
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--logdir", default="logs/embeddings")
    a = p.parse_args(argv)
    model, variables = load_any_checkpoint(a.checkpoint)
    print("exported to", export_embeddings(model, variables, a.logdir))


if __name__ == "__main__":
    main()
