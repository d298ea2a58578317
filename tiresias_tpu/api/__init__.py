"""api subpackage of tiresias-tpu."""
