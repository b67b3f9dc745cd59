"""Message base surface (isinstance checks, DecodeError)."""

from ._mini_runtime import DecodeError, EncodeError, MiniMessage as Message  # noqa: F401
