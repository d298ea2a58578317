"""models subpackage of tiresias-tpu."""
