"""store subpackage of tiresias-tpu."""
