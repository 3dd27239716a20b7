"""ClearML service HPO surface (hyperparameter/clearml_service.py):
task-clone + remote-enqueue primitive and the optimizer-service driver,
pinned against an injected clearml SDK double (the real service needs
credentials + a scheduler, absent here exactly as in the reference env;
reference surface: torchreid/hyperparameter/hyperparameter_optimizer.py
:20-100)."""
import sys
import types

import pytest


class _Recorder:
    def __init__(self):
        self.calls = []


def _fake_clearml(rec):
    clearml = types.ModuleType('clearml')
    automation = types.ModuleType('clearml.automation')

    class TaskTypes:
        optimizer = 'optimizer'

    class Task:
        _clones = []

        def __init__(self, name='task'):
            self.name = name
            self.params = {}

        @classmethod
        def init(cls, **kw):
            rec.calls.append(('Task.init', kw))
            t = cls('optimizer-task')
            return t

        @classmethod
        def clone(cls, source_task=None, name=None):
            rec.calls.append(('Task.clone', source_task, name))
            t = cls(name or 'clone')
            cls._clones.append(t)
            return t

        @classmethod
        def enqueue(cls, task, queue_name=None):
            rec.calls.append(('Task.enqueue', task.name, queue_name))

        def connect(self, args):
            rec.calls.append(('task.connect', dict(args)))
            return args

        def set_parameters(self, params):
            rec.calls.append(('task.set_parameters', dict(params)))
            self.params.update(params)

        def execute_remotely(self, queue_name=None, exit_process=False):
            rec.calls.append(('task.execute_remotely', queue_name,
                              exit_process))

    class _Range:
        def __init__(self, name, values=None, min_value=None,
                     max_value=None):
            self.name, self.values = name, values
            self.min_value, self.max_value = min_value, max_value

    class DiscreteParameterRange(_Range):
        pass

    class UniformIntegerParameterRange(_Range):
        pass

    class GridSearch:
        pass

    class RandomSearch:
        pass

    class HyperParameterOptimizer:
        def __init__(self, **kw):
            rec.calls.append(('HPO.__init__', kw))
            self.kw = kw

        def set_report_period(self, period):
            rec.calls.append(('HPO.set_report_period', period))

        def start(self, job_complete_callback=None):
            rec.calls.append(('HPO.start', job_complete_callback))

        def wait(self):
            rec.calls.append(('HPO.wait',))

        def get_top_experiments(self, top_k=3):
            rec.calls.append(('HPO.get_top_experiments', top_k))
            return ['exp-1', 'exp-2'][:top_k]

        def stop(self):
            rec.calls.append(('HPO.stop',))

    Task.TaskTypes = TaskTypes
    clearml.Task = Task
    automation.DiscreteParameterRange = DiscreteParameterRange
    automation.UniformIntegerParameterRange = UniformIntegerParameterRange
    automation.GridSearch = GridSearch
    automation.RandomSearch = RandomSearch
    automation.HyperParameterOptimizer = HyperParameterOptimizer
    clearml.automation = automation
    return clearml, automation


@pytest.fixture()
def fake_clearml(monkeypatch):
    rec = _Recorder()
    clearml, automation = _fake_clearml(rec)
    monkeypatch.setitem(sys.modules, 'clearml', clearml)
    monkeypatch.setitem(sys.modules, 'clearml.automation', automation)
    return rec


def test_import_gated_without_sdk(monkeypatch):
    """Constructing is cheap; only launch/clone touch the SDK, and the
    error names the extra to install."""
    monkeypatch.setitem(sys.modules, 'clearml', None)
    from bpbreid_tpu.hyperparameter.clearml_service import (
        ClearMLServiceOptimizer, clearml_available, clone_task_with_overrides)
    assert not clearml_available()
    opt = ClearMLServiceOptimizer('tmpl-1', {'train.batch_size': [32, 64]})
    with pytest.raises(ImportError, match='bpbreid-tpu\\[clearml\\]'):
        opt.launch()
    with pytest.raises(ImportError, match='in-process'):
        clone_task_with_overrides('tmpl-1', {'train.batch_size': 32})


def test_clone_task_with_overrides(fake_clearml):
    from bpbreid_tpu.hyperparameter.clearml_service import (
        clone_task_with_overrides)
    t = clone_task_with_overrides(
        'tmpl-7', {'loss.part_based.name': 'part_max_triplet_loss',
                   'train.batch_size': 32},
        execution_queue='tpu-queue', name='trial-0')
    # dotted keys -> the reference's General/ parameter paths
    assert t.params == {
        'General/loss/part_based/name': 'part_max_triplet_loss',
        'General/train/batch_size': 32}
    assert ('Task.clone', 'tmpl-7', 'trial-0') in fake_clearml.calls
    assert ('Task.enqueue', 'trial-0', 'tpu-queue') in fake_clearml.calls


def test_service_optimizer_launch(fake_clearml):
    from bpbreid_tpu.hyperparameter.clearml_service import (
        ClearMLServiceOptimizer)
    opt = ClearMLServiceOptimizer(
        'tmpl-42',
        {'loss.part_based.name': ['a_loss', 'b_loss'],
         'train.batch_size': (32, 128)},
        objective='rank1', execution_queue='default', total_max_jobs=4)
    top = opt.launch()
    assert top == ['exp-1', 'exp-2']
    calls = dict((c[0], c) for c in fake_clearml.calls)
    # registered as an optimizer-type service task
    assert calls['Task.init'][1]['task_type'] == 'optimizer'
    hpo_kw = calls['HPO.__init__'][1]
    assert hpo_kw['base_task_id'] == 'tmpl-42'
    assert hpo_kw['objective_metric_title'] == 'Test/rank1'
    assert hpo_kw['objective_metric_sign'] == 'max'
    assert hpo_kw['execution_queue'] == 'default'
    assert hpo_kw['total_max_jobs'] == 4
    ranges = {r.name: r for r in hpo_kw['hyper_parameters']}
    assert ranges['General/loss/part_based/name'].values == \
        ['a_loss', 'b_loss']
    assert ranges['General/train/batch_size'].min_value == 32
    assert ranges['General/train/batch_size'].max_value == 128
    # full lifecycle ran
    for step in ('HPO.start', 'HPO.wait', 'HPO.get_top_experiments',
                 'HPO.stop'):
        assert step in calls


def test_service_optimizer_run_as_service(fake_clearml):
    """run_as_service enqueues THIS task on the services queue and
    returns without starting the search locally (the reference's
    execute_remotely path)."""
    from bpbreid_tpu.hyperparameter.clearml_service import (
        ClearMLServiceOptimizer)
    opt = ClearMLServiceOptimizer('tmpl-1', {'train.batch_size': [32]})
    assert opt.launch(run_as_service=True) is None
    names = [c[0] for c in fake_clearml.calls]
    assert ('task.execute_remotely', 'services', True) in fake_clearml.calls
    assert 'HPO.start' not in names
