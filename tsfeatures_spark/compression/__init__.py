from .delta import BlockCorruption, dod_decode, dod_encode, varint_decode, varint_encode, zigzag_decode, zigzag_encode  # noqa: F401
from .gorilla import xor_decode, xor_encode  # noqa: F401
