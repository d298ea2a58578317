"""engine subpackage of tiresias-tpu."""
