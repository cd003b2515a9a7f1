"""Config-JSON driven entry points mirroring the reference CLIs."""
