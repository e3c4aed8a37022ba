"""Training loop, optimizer schedule, and checkpointing for NeRF."""
