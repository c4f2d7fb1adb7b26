import socket

from thrift.transport.TTransport import TTransportBase, TTransportException


class TSocket(TTransportBase):
    def __init__(self, host="localhost", port=9090):
        self.host = host
        self.port = port
        self._sock = None

    def setTimeout(self, ms):
        if self._sock is not None:
            self._sock.settimeout(ms / 1000.0 if ms is not None else None)

    def isOpen(self):
        return self._sock is not None

    def open(self):
        try:
            self._sock = socket.create_connection((self.host, self.port))
        except OSError as e:
            raise TTransportException(
                TTransportException.NOT_OPEN, str(e)
            ) from e

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def read(self, sz):
        data = self._sock.recv(sz)
        if not data:
            raise TTransportException(
                TTransportException.END_OF_FILE, "socket closed"
            )
        return data

    def write(self, buf):
        self._sock.sendall(buf)

    def flush(self):
        pass
