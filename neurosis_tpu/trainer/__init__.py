"""Functional training runtime: TrainState, DiffusionEngine, loop, callbacks."""
