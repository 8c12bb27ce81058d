class _Bar:
    def __init__(self, gen=None, parent=None, total=None, **kwargs):
        self.gen = gen if gen is not None else []
        self.total = total
        self.main_bar = self
        self.child = None
        self.comment = ""

    def __iter__(self):
        yield from self.gen

    def update(self, val=None):
        pass

    def write(self, line, table=False):
        print(line)

    def on_iter_end(self):
        pass


class ConsoleMasterBar(_Bar):
    pass


def master_bar(gen=None, **kwargs):
    return ConsoleMasterBar(gen, **kwargs)


def progress_bar(gen=None, parent=None, **kwargs):
    return _Bar(gen, parent=parent, **kwargs)
