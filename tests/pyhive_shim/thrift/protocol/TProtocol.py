class TProtocolException(Exception):
    UNKNOWN = 0
    INVALID_DATA = 1
    BAD_VERSION = 4

    def __init__(self, type=UNKNOWN, message=None):
        super().__init__(message)
        self.type = type
        self.message = message
