"""Multi-modal contrastive pretraining (SimCLR-style, NT-Xent) with the
SSL online linear probe evaluating representations during training —
the reference's contrastivemodel.py + SSLOnlineEval path.

Under data parallelism the contrastive negatives are GLOBAL across
replicas automatically (the loss computes on the full sharded batch;
GSPMD inserts the gather).
"""

from devt_tpu.main import main

if __name__ == "__main__":
    main([
        "--model", "contrastive", "--data_set", "synthetic",
        "--batch_size", "8", "--input_dimension", "128",
        "--hidden_layer", "64", "--projection_size", "32",
        "--epochs", "2", "--max_steps", "40", "--log_every", "10",
        "--checkpoint_dir", "/tmp/devt_example_contrastive",
    ])
