"""Torch transcription of the public S3FD architecture, used as a parity
oracle for geomconsistentfr_tpu.models.s3fd.

Written from the same public spec (Zhang et al. ICCV 2017; the
face_alignment package's SFD detector, which the reference imports at
recrop_CelebA-HQ_images.py:9-10 but which is not installable here). Tests
share random weights between this module and the Flax implementation via
convert_s3fd_state_dict, pinning layer graph, padding semantics, L2Norm,
the max-out background label, anchor decode and NMS. Real published
weights drop into either side unchanged.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class L2Norm(nn.Module):
    def __init__(self, n_channels: int, scale: float = 1.0):
        super().__init__()
        self.weight = nn.Parameter(torch.full((n_channels,), float(scale)))

    def forward(self, x):
        norm = x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10
        return x / norm * self.weight.view(1, -1, 1, 1)


class S3FDTorch(nn.Module):
    def __init__(self):
        super().__init__()
        c = nn.Conv2d
        self.conv1_1 = c(3, 64, 3, 1, 1)
        self.conv1_2 = c(64, 64, 3, 1, 1)
        self.conv2_1 = c(64, 128, 3, 1, 1)
        self.conv2_2 = c(128, 128, 3, 1, 1)
        self.conv3_1 = c(128, 256, 3, 1, 1)
        self.conv3_2 = c(256, 256, 3, 1, 1)
        self.conv3_3 = c(256, 256, 3, 1, 1)
        self.conv4_1 = c(256, 512, 3, 1, 1)
        self.conv4_2 = c(512, 512, 3, 1, 1)
        self.conv4_3 = c(512, 512, 3, 1, 1)
        self.conv5_1 = c(512, 512, 3, 1, 1)
        self.conv5_2 = c(512, 512, 3, 1, 1)
        self.conv5_3 = c(512, 512, 3, 1, 1)
        self.fc6 = c(512, 1024, 3, 1, 3)
        self.fc7 = c(1024, 1024, 1, 1, 0)
        self.conv6_1 = c(1024, 256, 1, 1, 0)
        self.conv6_2 = c(256, 512, 3, 2, 1)
        self.conv7_1 = c(512, 128, 1, 1, 0)
        self.conv7_2 = c(128, 256, 3, 2, 1)
        self.conv3_3_norm = L2Norm(256, 10.0)
        self.conv4_3_norm = L2Norm(512, 8.0)
        self.conv5_3_norm = L2Norm(512, 5.0)
        self.conv3_3_norm_mbox_conf = c(256, 4, 3, 1, 1)
        self.conv3_3_norm_mbox_loc = c(256, 4, 3, 1, 1)
        self.conv4_3_norm_mbox_conf = c(512, 2, 3, 1, 1)
        self.conv4_3_norm_mbox_loc = c(512, 4, 3, 1, 1)
        self.conv5_3_norm_mbox_conf = c(512, 2, 3, 1, 1)
        self.conv5_3_norm_mbox_loc = c(512, 4, 3, 1, 1)
        self.fc7_mbox_conf = c(1024, 2, 3, 1, 1)
        self.fc7_mbox_loc = c(1024, 4, 3, 1, 1)
        self.conv6_2_mbox_conf = c(512, 2, 3, 1, 1)
        self.conv6_2_mbox_loc = c(512, 4, 3, 1, 1)
        self.conv7_2_mbox_conf = c(256, 2, 3, 1, 1)
        self.conv7_2_mbox_loc = c(256, 4, 3, 1, 1)

    def forward(self, x):
        h = F.relu(self.conv1_1(x))
        h = F.relu(self.conv1_2(h))
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv2_1(h))
        h = F.relu(self.conv2_2(h))
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv3_1(h))
        h = F.relu(self.conv3_2(h))
        h = F.relu(self.conv3_3(h))
        f3_3 = h
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv4_1(h))
        h = F.relu(self.conv4_2(h))
        h = F.relu(self.conv4_3(h))
        f4_3 = h
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.conv5_1(h))
        h = F.relu(self.conv5_2(h))
        h = F.relu(self.conv5_3(h))
        f5_3 = h
        h = F.max_pool2d(h, 2, 2)
        h = F.relu(self.fc6(h))
        h = F.relu(self.fc7(h))
        ffc7 = h
        h = F.relu(self.conv6_1(h))
        h = F.relu(self.conv6_2(h))
        f6_2 = h
        h = F.relu(self.conv7_1(h))
        h = F.relu(self.conv7_2(h))
        f7_2 = h

        f3_3 = self.conv3_3_norm(f3_3)
        f4_3 = self.conv4_3_norm(f4_3)
        f5_3 = self.conv5_3_norm(f5_3)

        cls1 = self.conv3_3_norm_mbox_conf(f3_3)
        reg1 = self.conv3_3_norm_mbox_loc(f3_3)
        cls2 = self.conv4_3_norm_mbox_conf(f4_3)
        reg2 = self.conv4_3_norm_mbox_loc(f4_3)
        cls3 = self.conv5_3_norm_mbox_conf(f5_3)
        reg3 = self.conv5_3_norm_mbox_loc(f5_3)
        cls4 = self.fc7_mbox_conf(ffc7)
        reg4 = self.fc7_mbox_loc(ffc7)
        cls5 = self.conv6_2_mbox_conf(f6_2)
        reg5 = self.conv6_2_mbox_loc(f6_2)
        cls6 = self.conv7_2_mbox_conf(f7_2)
        reg6 = self.conv7_2_mbox_loc(f7_2)

        # Max-out background label on the stride-4 head.
        chunk = torch.chunk(cls1, 4, 1)
        bmax = torch.max(torch.max(chunk[0], chunk[1]), chunk[2])
        cls1 = torch.cat([bmax, chunk[3]], dim=1)

        return [cls1, reg1, cls2, reg2, cls3, reg3,
                cls4, reg4, cls5, reg5, cls6, reg6]


def reference_detect(model: S3FDTorch, image_bgr: np.ndarray) -> np.ndarray:
    """detect()-equivalent candidates (pre-NMS), [x1,y1,x2,y2,score] rows."""
    x = np.asarray(image_bgr, np.float32) - np.array(
        [104.0, 117.0, 123.0], np.float32
    )
    t = torch.from_numpy(x.transpose(2, 0, 1)[None])
    with torch.no_grad():
        olist = model(t)
    rows = []
    for i in range(len(olist) // 2):
        ocls = F.softmax(olist[2 * i], dim=1).numpy()
        oreg = olist[2 * i + 1].numpy()
        stride = 2 ** (i + 2)
        for hh, ww in zip(*np.where(ocls[0, 1] > 0.05)):
            axc = stride / 2 + ww * stride
            ayc = stride / 2 + hh * stride
            side = stride * 4
            loc = oreg[0, :, hh, ww]
            cx = axc + loc[0] * 0.1 * side
            cy = ayc + loc[1] * 0.1 * side
            bw = side * np.exp(loc[2] * 0.2)
            bh = side * np.exp(loc[3] * 0.2)
            rows.append([cx - bw / 2, cy - bh / 2, cx - bw / 2 + bw,
                         cy - bh / 2 + bh, ocls[0, 1, hh, ww]])
    if not rows:
        return np.zeros((0, 5), np.float32)
    return np.asarray(rows, np.float32)
