"""Executable entry points (the launch/*.launch analogues)."""
