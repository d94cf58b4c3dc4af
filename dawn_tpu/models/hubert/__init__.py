from dawn_tpu.models.hubert.model import HubertConfig, HubertModel
