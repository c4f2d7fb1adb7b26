"""Strict TBinaryProtocol: big-endian primitives, version word
0x80010000 | message-type on writeMessageBegin (public thrift spec)."""

from __future__ import annotations

import struct

from thrift.Thrift import TType
from thrift.protocol.TProtocol import TProtocolException

VERSION_MASK = 0xFFFF0000
VERSION_1 = 0x80010000


class TBinaryProtocol:
    def __init__(self, trans):
        self.trans = trans
        self._fast_encode = None
        self._fast_decode = None

    # -- raw helpers -------------------------------------------------------
    def _read(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.trans.read(n - len(buf))
            if not chunk:
                raise EOFError("thrift transport closed mid-frame")
            buf += chunk
        return buf

    # -- message -----------------------------------------------------------
    def writeMessageBegin(self, name, ttype, seqid):
        self.trans.write(struct.pack(">I", VERSION_1 | ttype))
        self.writeString(name)
        self.writeI32(seqid)

    def writeMessageEnd(self):
        pass

    def readMessageBegin(self):
        word = struct.unpack(">I", self._read(4))[0]
        if word & VERSION_MASK != VERSION_1:
            raise TProtocolException(
                TProtocolException.BAD_VERSION, f"bad version 0x{word:08x}"
            )
        mtype = word & 0xFF
        name = self.readString()
        seqid = self.readI32()
        return name, mtype, seqid

    def readMessageEnd(self):
        pass

    # -- struct / field ----------------------------------------------------
    def writeStructBegin(self, name):
        pass

    def writeStructEnd(self):
        pass

    def writeFieldBegin(self, name, ftype, fid):
        self.writeByte(ftype)
        self.writeI16(fid)

    def writeFieldEnd(self):
        pass

    def writeFieldStop(self):
        self.writeByte(TType.STOP)

    def readStructBegin(self):
        return None

    def readStructEnd(self):
        pass

    def readFieldBegin(self):
        ftype = self.readByte()
        if ftype == TType.STOP:
            return None, ftype, 0
        return None, ftype, self.readI16()

    def readFieldEnd(self):
        pass

    # -- containers --------------------------------------------------------
    def writeMapBegin(self, ktype, vtype, size):
        self.writeByte(ktype)
        self.writeByte(vtype)
        self.writeI32(size)

    def writeMapEnd(self):
        pass

    def readMapBegin(self):
        return self.readByte(), self.readByte(), self.readI32()

    def readMapEnd(self):
        pass

    def writeListBegin(self, etype, size):
        self.writeByte(etype)
        self.writeI32(size)

    def writeListEnd(self):
        pass

    def readListBegin(self):
        return self.readByte(), self.readI32()

    def readListEnd(self):
        pass

    def writeSetBegin(self, etype, size):
        self.writeListBegin(etype, size)

    def writeSetEnd(self):
        pass

    def readSetBegin(self):
        return self.readListBegin()

    def readSetEnd(self):
        pass

    # -- scalars -----------------------------------------------------------
    def writeBool(self, v):
        self.writeByte(1 if v else 0)

    def writeByte(self, v):
        self.trans.write(struct.pack(">b", v))

    def writeI16(self, v):
        self.trans.write(struct.pack(">h", v))

    def writeI32(self, v):
        self.trans.write(struct.pack(">i", v))

    def writeI64(self, v):
        self.trans.write(struct.pack(">q", v))

    def writeDouble(self, v):
        self.trans.write(struct.pack(">d", v))

    def writeBinary(self, v):
        self.writeI32(len(v))
        self.trans.write(v)

    def writeString(self, v):
        if isinstance(v, str):
            v = v.encode("utf-8")
        self.writeBinary(v)

    def readBool(self):
        return self.readByte() != 0

    def readByte(self):
        return struct.unpack(">b", self._read(1))[0]

    def readI16(self):
        return struct.unpack(">h", self._read(2))[0]

    def readI32(self):
        return struct.unpack(">i", self._read(4))[0]

    def readI64(self):
        return struct.unpack(">q", self._read(8))[0]

    def readDouble(self):
        return struct.unpack(">d", self._read(8))[0]

    def readBinary(self):
        return self._read(self.readI32())

    def readString(self):
        return self.readBinary().decode("utf-8")

    # -- skip (unknown fields) ----------------------------------------------
    def skip(self, ftype):
        if ftype == TType.BOOL or ftype == TType.BYTE:
            self._read(1)
        elif ftype == TType.I16:
            self._read(2)
        elif ftype == TType.I32:
            self._read(4)
        elif ftype in (TType.I64, TType.DOUBLE):
            self._read(8)
        elif ftype == TType.STRING:
            self.readBinary()
        elif ftype == TType.STRUCT:
            while True:
                _, et, _ = self.readFieldBegin()
                if et == TType.STOP:
                    break
                self.skip(et)
        elif ftype == TType.MAP:
            kt, vt, size = self.readMapBegin()
            for _ in range(size):
                self.skip(kt)
                self.skip(vt)
        elif ftype in (TType.LIST, TType.SET):
            et, size = self.readListBegin()
            for _ in range(size):
                self.skip(et)
        else:
            raise TProtocolException(
                TProtocolException.INVALID_DATA, f"cannot skip type {ftype}"
            )


class TBinaryProtocolFactory:
    def getProtocol(self, trans):
        return TBinaryProtocol(trans)
