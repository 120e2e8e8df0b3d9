from rambl_tpu.data.simulate import SimulatedDataset, simulate_dataset  # noqa: F401
