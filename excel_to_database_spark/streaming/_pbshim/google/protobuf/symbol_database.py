"""Symbol database stub: generated modules call ``Default()`` once at
import; nothing in the state-server path reads it back."""


class SymbolDatabase:
    def RegisterMessage(self, message):  # noqa: N802
        return message

    def RegisterFileDescriptor(self, fd):  # noqa: N802
        return fd


_DEFAULT = SymbolDatabase()


def Default():  # noqa: N802
    return _DEFAULT
