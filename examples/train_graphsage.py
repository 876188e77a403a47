"""Per-model wrapper (reference example/samgraph parity): trains graphsage."""
import sys

sys.argv.insert(1, "--model")
sys.argv.insert(2, "graphsage")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples.train_gnn import main

if __name__ == "__main__":
    main()
