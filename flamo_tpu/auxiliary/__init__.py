from flamo_tpu.auxiliary import eq, minimize, scattering, reverb, filterbank, velvet
from flamo_tpu.auxiliary.config import HomogeneousFDNConfig
