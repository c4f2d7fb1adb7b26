"""TType/TMessageType constants + exception base classes (public thrift
binary-protocol spec values)."""


class TType:
    STOP = 0
    VOID = 1
    BOOL = 2
    BYTE = 3
    I08 = 3
    DOUBLE = 4
    I16 = 6
    I32 = 8
    I64 = 10
    STRING = 11
    UTF7 = 11
    STRUCT = 12
    MAP = 13
    SET = 14
    LIST = 15
    UTF8 = 16
    UTF16 = 17


class TMessageType:
    CALL = 1
    REPLY = 2
    EXCEPTION = 3
    ONEWAY = 4


class TFrozenDict(dict):
    def __hash__(self):  # generated const maps need hashability
        return hash(tuple(sorted(self.items())))


class TException(Exception):
    def __init__(self, message=None):
        super().__init__(message)
        self.message = message


class TApplicationException(TException):
    UNKNOWN = 0
    UNKNOWN_METHOD = 1

    def __init__(self, type=UNKNOWN, message=None):
        super().__init__(message)
        self.type = type

    def read(self, iprot):
        iprot.readStructBegin()
        while True:
            _, ftype, fid = iprot.readFieldBegin()
            if ftype == TType.STOP:
                break
            if fid == 1 and ftype == TType.STRING:
                self.message = iprot.readString()
            elif fid == 2 and ftype == TType.I32:
                self.type = iprot.readI32()
            else:
                iprot.skip(ftype)
            iprot.readFieldEnd()
        iprot.readStructEnd()

    def write(self, oprot):
        oprot.writeStructBegin("TApplicationException")
        if self.message is not None:
            oprot.writeFieldBegin("message", TType.STRING, 1)
            oprot.writeString(self.message)
            oprot.writeFieldEnd()
        oprot.writeFieldBegin("type", TType.I32, 2)
        oprot.writeI32(self.type)
        oprot.writeFieldEnd()
        oprot.writeFieldStop()
        oprot.writeStructEnd()


class TProcessor:
    pass
