"""serve subpackage of tiresias-tpu."""
