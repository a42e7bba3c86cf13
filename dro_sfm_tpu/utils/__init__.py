"""Config, logging, depth/image utilities."""
