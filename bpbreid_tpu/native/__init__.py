from bpbreid_tpu.native import rank
