"""Logger: experiment-tracker backend mux
(reference: torchreid/utils/logging/logger.py:10-109).

Backends (wandb / tensorboard / clearml) activate only when their
packages exist AND the config enables them; disk-dump of scalars and
figures is always available. A ``StdoutLogger`` tee mirrors the
reference's legacy console capture (deprecated_loggers.py)."""
import json
import os
import os.path as osp
import sys

__all__ = ['Logger', 'StdoutLogger']


class Logger:
    _current = None

    def __init__(self, config=None, save_dir=None):
        self.cfg = config
        self.save_dir = save_dir or (config.data.save_dir if config else 'logs')
        self.scalars = []
        self._backends = []
        if config is not None:
            lg = config.project.logger
            if lg.use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._backends.append(
                        ('tb', SummaryWriter(log_dir=self.save_dir)))
                except ImportError:
                    print('tensorboard unavailable; falling back to disk logs')
            if lg.use_wandb:
                try:
                    import wandb
                    wandb.init(project=config.project.name,
                               name=config.project.experiment_name or None,
                               config=config.to_dict())
                    self._backends.append(('wandb', wandb))
                except ImportError:
                    print('wandb unavailable; falling back to disk logs')
        Logger._current = self

    @classmethod
    def current_logger(cls):
        return cls._current

    def add_scalar(self, name, value, step=None):
        self.scalars.append({'name': name, 'value': float(value),
                             'step': step})
        for kind, b in self._backends:
            if kind == 'tb':
                b.add_scalar(name, value, step)
            elif kind == 'wandb':
                b.log({name: value}, step=step)

    def add_figure(self, name, fig, step=None):
        if self.cfg is not None and self.cfg.project.logger.save_disk:
            d = osp.join(self.save_dir, 'figures')
            os.makedirs(d, exist_ok=True)
            try:
                fig.savefig(osp.join(d, '{}_{}.png'.format(
                    name.replace('/', '_'), step or 0)))
            except Exception:
                pass

    def add_image(self, name, image, step=None):
        pass

    def flush(self):
        os.makedirs(self.save_dir, exist_ok=True)
        with open(osp.join(self.save_dir, 'scalars.json'), 'w') as f:
            json.dump(self.scalars, f)


class StdoutLogger:
    """Tee stdout to a file (reference: deprecated_loggers.py Logger)."""

    def __init__(self, fpath=None):
        self.console = sys.stdout
        self.file = None
        if fpath is not None:
            os.makedirs(osp.dirname(osp.abspath(fpath)), exist_ok=True)
            self.file = open(fpath, 'w')

    def write(self, msg):
        self.console.write(msg)
        if self.file is not None:
            self.file.write(msg)

    def flush(self):
        self.console.flush()
        if self.file is not None:
            self.file.flush()

    def close(self):
        if self.file is not None:
            self.file.close()


class RankLogger:
    """Records rank-1 over epochs per target dataset and prints a
    summary with the best epoch (reference:
    torchreid/utils/loggers.py RankLogger, deprecated_loggers.py:96-146)."""

    def __init__(self, sources, targets):
        self.sources = [sources] if isinstance(sources, str) else list(sources)
        self.targets = [targets] if isinstance(targets, str) else list(targets)
        self.logger = {name: {'epoch': [], 'rank1': []}
                       for name in self.targets}

    def write(self, name, epoch, rank1):
        self.logger[name]['epoch'].append(epoch)
        self.logger[name]['rank1'].append(rank1)

    def show_summary(self):
        print('=> Show performance summary')
        for name in self.targets:
            from_where = 'source' if name in self.sources else 'target'
            print('{} ({})'.format(name, from_where))
            for epoch, rank1 in zip(self.logger[name]['epoch'],
                                    self.logger[name]['rank1']):
                print('- epoch {}\t rank1 {:.1%}'.format(epoch, rank1))
            if self.logger[name]['rank1']:
                import numpy as _np
                best = int(_np.argmax(self.logger[name]['rank1']))
                print('  best: epoch {} rank1 {:.1%}'.format(
                    self.logger[name]['epoch'][best],
                    self.logger[name]['rank1'][best]))
