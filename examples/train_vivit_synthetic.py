"""Train the flagship ViViT (factorized space-time transformer) on
synthetic clips — the model behind the north-star bench (bench.py).

Mirrors the reference's `python src/main.py` flow (config-driven model +
dataset dispatch) with the synthetic dataset standing in for the corpus.
"""

from devt_tpu.main import main

if __name__ == "__main__":
    main([
        "--model", "vivit", "--data_set", "synthetic",
        "--batch_size", "8", "--frame_len", "8", "--n_classes", "19",
        "--epochs", "2", "--max_steps", "40", "--log_every", "5",
        "--opt", "adamW", "--learning_rate", "1e-4",
        "--checkpoint_dir", "/tmp/devt_example_vivit",
    ])
