from amuse_tpu.viz.export import export_windows, write_smplx_npz  # noqa: F401
