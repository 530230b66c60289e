"""Device ops: the TPU analog of the reference's PTX kernel + NPP layer."""
