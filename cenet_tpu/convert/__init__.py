from cenet_tpu.convert.torch2jax import convert_state_dict, load_torch_checkpoint, torch_key_for  # noqa: F401
