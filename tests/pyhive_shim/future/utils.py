def iteritems(d):
    return iter(d.items())


def itervalues(d):
    return iter(d.values())


def with_metaclass(meta, *bases):
    return meta("_NewBase", bases or (object,), {})
