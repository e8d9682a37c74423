"""The reference's primary training path: the pyramid transformer (PTN,
src/models/transformer.py) over per-scene expert-embedding sequences,
with the TransformerEval callback stack (threshold-swept F1, mAP,
classification report) firing each validation epoch.
"""

from devt_tpu.main import main

if __name__ == "__main__":
    main([
        "--model", "ptn", "--data_set", "synthetic",
        "--batch_size", "4", "--seq_len", "13", "--nlayers", "2",
        "--input_dimension", "2048", "--nhid", "2048", "--nhead", "8",
        "--n_classes", "15", "--dropout", "0.1",
        "--epochs", "2", "--max_steps", "20", "--log_every", "10",
        "--checkpoint_dir", "/tmp/devt_example_ptn",
    ])
