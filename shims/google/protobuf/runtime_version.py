"""Runtime-version handshake: generated code validates the runtime is at
least as new as the gencode. The mini runtime implements the wire format,
which is stable across these versions, so validation only rejects majors
it has never seen."""

import enum


class Domain(enum.Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(domain, major, minor, patch, suffix,
                                   location) -> None:
    if major not in (4, 5, 6):
        raise VersionError(
            f"mini protobuf runtime: gencode major version {major} of "
            f"{location} is outside the validated range (4-6)")
