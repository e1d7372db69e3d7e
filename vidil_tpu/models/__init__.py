from vidil_tpu.models import layers, vit, med
