import io


class TTransportException(Exception):
    UNKNOWN = 0
    NOT_OPEN = 1
    END_OF_FILE = 4

    def __init__(self, type=UNKNOWN, message=None):
        super().__init__(message)
        self.type = type
        self.message = message


class TTransportBase:
    def isOpen(self):
        return False

    def open(self):
        pass

    def close(self):
        pass

    def read(self, sz):
        raise NotImplementedError

    def write(self, buf):
        raise NotImplementedError

    def flush(self):
        pass


class CReadableTransport:
    """Marker base the accelerated decoder checks for (never used here —
    _fast_decode is always None in the shim)."""


class TBufferedTransport(TTransportBase):
    def __init__(self, trans, rbuf_size=4096):
        self._trans = trans
        self._wbuf = io.BytesIO()
        self._rbuf = b""
        self._rbuf_size = rbuf_size

    def isOpen(self):
        return self._trans.isOpen()

    def open(self):
        return self._trans.open()

    def close(self):
        return self._trans.close()

    def read(self, sz):
        if not self._rbuf:
            self._rbuf = self._trans.read(max(sz, self._rbuf_size))
        out, self._rbuf = self._rbuf[:sz], self._rbuf[sz:]
        return out

    def write(self, buf):
        self._wbuf.write(buf)

    def flush(self):
        data = self._wbuf.getvalue()
        self._wbuf = io.BytesIO()
        if data:
            self._trans.write(data)
        self._trans.flush()
