"""parallel subpackage of tiresias-tpu."""
