basestring = str
unicode = str
