"""Model registry and factory (reference: torchreid/models/__init__.py:29-140)."""
from bpbreid_tpu.models import (hrnet, mobilenetv2, osnet, pcb, resnet,
    densenet, hacnn, inceptionresnetv2, inceptionv4, mlfn, mudeep, nasnet,
    pvpm, resnet_fastreid, resnet_ibn, resnetmid, senet, shufflenet,
    shufflenetv2, squeezenet, xception)
from bpbreid_tpu.models.hrnet import hrnet32
from bpbreid_tpu.models.osnet import (
    osnet_ain_x1_0, osnet_ibn_x1_0, osnet_x0_5, osnet_x0_25, osnet_x0_75,
    osnet_x1_0,
)
from bpbreid_tpu.models.resnet import (
    resnet18, resnet34, resnet50, resnet50_fc512, resnet101, resnet152,
    resnext50_32x4d, resnext101_32x8d,
)
from bpbreid_tpu.models.mobilenetv2 import mobilenetv2_x1_0, mobilenetv2_x1_4
from bpbreid_tpu.models.resnet_ibn import resnet50_ibn_a, resnet50_ibn_b
from bpbreid_tpu.models.densenet import (
    densenet121, densenet121_fc512, densenet161, densenet169, densenet201,
)
from bpbreid_tpu.models.hacnn import hacnn
from bpbreid_tpu.models.inceptionresnetv2 import inceptionresnetv2
from bpbreid_tpu.models.inceptionv4 import inceptionv4
from bpbreid_tpu.models.mlfn import mlfn
from bpbreid_tpu.models.mudeep import mudeep
from bpbreid_tpu.models.nasnet import nasnetamobile
from bpbreid_tpu.models.pvpm import pose_p4, pose_p4s, pose_p6, pose_p6s
from bpbreid_tpu.models.xception import xception
from bpbreid_tpu.models.resnetmid import resnet50mid
from bpbreid_tpu.models.shufflenet import shufflenet
from bpbreid_tpu.models.squeezenet import (
    squeezenet1_0, squeezenet1_0_fc512, squeezenet1_1,
)
from bpbreid_tpu.models.senet import (
    se_resnet50, se_resnet50_fc512, se_resnet101, se_resnet152,
    se_resnext50_32x4d, se_resnext101_32x4d, senet154,
)
from bpbreid_tpu.models.pcb import pcb_p4, pcb_p6
from bpbreid_tpu.models.shufflenetv2 import (
    shufflenet_v2_x0_5, shufflenet_v2_x1_0, shufflenet_v2_x1_5,
    shufflenet_v2_x2_0,
)
from bpbreid_tpu.models.resnet_fastreid import (
    fastreid_resnet, fastreid_resnet_ibn, fastreid_resnet_ibn_nl,
    fastreid_resnet_nl,
)

__model_factory = {
    'resnet18': resnet18,
    'resnet34': resnet34,
    'resnet50': resnet50,
    'resnet101': resnet101,
    'resnet152': resnet152,
    'resnext50_32x4d': resnext50_32x4d,
    'resnext101_32x8d': resnext101_32x8d,
    'resnet50_fc512': resnet50_fc512,
    'hrnet32': hrnet32,
    'osnet_x1_0': osnet_x1_0,
    'osnet_x0_75': osnet_x0_75,
    'osnet_x0_5': osnet_x0_5,
    'osnet_x0_25': osnet_x0_25,
    'osnet_ibn_x1_0': osnet_ibn_x1_0,
    'osnet_ain_x1_0': osnet_ain_x1_0,
    'fastreid_resnet': fastreid_resnet,
    'fastreid_resnet_ibn': fastreid_resnet_ibn,
    'fastreid_resnet_nl': fastreid_resnet_nl,
    'fastreid_resnet_ibn_nl': fastreid_resnet_ibn_nl,
    'pcb_p6': pcb_p6,
    'pcb_p4': pcb_p4,
    'mobilenetv2_x1_0': mobilenetv2_x1_0,
    'mobilenetv2_x1_4': mobilenetv2_x1_4,
    'shufflenet_v2_x0_5': shufflenet_v2_x0_5,
    'shufflenet_v2_x1_0': shufflenet_v2_x1_0,
    'shufflenet_v2_x1_5': shufflenet_v2_x1_5,
    'shufflenet_v2_x2_0': shufflenet_v2_x2_0,
    'resnet50_ibn_a': resnet50_ibn_a,
    'resnet50_ibn_b': resnet50_ibn_b,
    'senet154': senet154,
    'se_resnet50': se_resnet50,
    'se_resnet50_fc512': se_resnet50_fc512,
    'se_resnet101': se_resnet101,
    'se_resnet152': se_resnet152,
    'se_resnext50_32x4d': se_resnext50_32x4d,
    'se_resnext101_32x4d': se_resnext101_32x4d,
    'shufflenet': shufflenet,
    'squeezenet1_0': squeezenet1_0,
    'squeezenet1_0_fc512': squeezenet1_0_fc512,
    'squeezenet1_1': squeezenet1_1,
    'mlfn': mlfn,
    'resnet50mid': resnet50mid,
    'densenet121': densenet121,
    'densenet169': densenet169,
    'densenet201': densenet201,
    'densenet161': densenet161,
    'densenet121_fc512': densenet121_fc512,
    'hacnn': hacnn,
    'mudeep': mudeep,
    'xception': xception,
    'inceptionv4': inceptionv4,
    'inceptionresnetv2': inceptionresnetv2,
    'pose_p4': pose_p4,
    'pose_p6': pose_p6,
    'pose_p4s': pose_p4s,
    'pose_p6s': pose_p6s,
    'nasnetamobile': nasnetamobile,
}


def show_avai_models():
    return sorted(__model_factory)


def register_model(name, fn):
    if name in __model_factory:
        raise KeyError('model {} already registered'.format(name))
    __model_factory[name] = fn


def build_model(name, num_classes, loss='softmax', pretrained=True,
                use_gpu=True, **kwargs):
    """Build a model by registry name (mirrors
    torchreid/models/__init__.py:102-140). Returns a flax Module; weight
    loading happens via utils.torch_weights / checkpoints."""
    del use_gpu
    if name in ('bpbreid', 'pcb', 'bot'):
        # imported lazily: bpbreid.py itself uses this registry for backbones
        from bpbreid_tpu.models import bpbreid as _bpbreid_mod
        return getattr(_bpbreid_mod, name)(num_classes, loss=loss,
                                           pretrained=pretrained, **kwargs)
    if name not in __model_factory:
        raise KeyError('Unknown model: {}. Must be one of {}'.format(
            name, show_avai_models() + ['bpbreid', 'pcb', 'bot']))
    return __model_factory[name](num_classes=num_classes, loss=loss,
                                 pretrained=pretrained, **kwargs)
