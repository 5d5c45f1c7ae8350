"""Torch oracle: diffusers-style AutoencoderKL (SD-VAE), used ONLY to prove
`flocoder_tpu.models.sd_vae.convert_sd_vae_state_dict` + the flax forward
against torch numerics (tests/test_parity_sd_vae.py). diffusers is not
installed in this environment, so the architecture is restated here from its
public definition with state_dict key names matching diffusers' exactly
(``encoder.down_blocks.{b}.resnets.{r}.conv1.weight`` …). Reference behavior
being reproduced: flocoder/codecs.py:631-663 (SD_VAE_Wrapper around
``stabilityai/sd-vae-ft-mse``; encode → latent_dist.mean, decode → sample).
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    """Single-head VAE attention (diffusers Attention with heads=1)."""

    def __init__(self, ch, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        hidden = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(hidden), self.to_k(hidden), self.to_v(hidden)
        attn = torch.softmax(q @ k.transpose(1, 2) * (c ** -0.5), dim=-1)
        out = self.to_out[0](attn @ v)
        return x + out.transpose(1, 2).view(b, c, h, w)


class _Resnets(nn.Module):
    def __init__(self, resnets):
        super().__init__()
        self.resnets = nn.ModuleList(resnets)


class DownBlock(_Resnets):
    def __init__(self, in_ch, out_ch, num_resnets=2, downsample=True):
        resnets = [ResnetBlock2D(in_ch if r == 0 else out_ch, out_ch)
                   for r in range(num_resnets)]
        super().__init__(resnets)
        self.downsamplers = None
        if downsample:
            ds = nn.Module()
            ds.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)
            self.downsamplers = nn.ModuleList([ds])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = F.pad(x, (0, 1, 0, 1))  # diffusers' asymmetric VAE pad
            x = self.downsamplers[0].conv(x)
        return x


class UpBlock(_Resnets):
    def __init__(self, in_ch, out_ch, num_resnets=3, upsample=True):
        resnets = [ResnetBlock2D(in_ch if r == 0 else out_ch, out_ch)
                   for r in range(num_resnets)]
        super().__init__(resnets)
        self.upsamplers = None
        if upsample:
            us = nn.Module()
            us.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class MidBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock2D(ch, ch),
                                      ResnetBlock2D(ch, ch)])
        self.attentions = nn.ModuleList([Attention(ch)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class Encoder(nn.Module):
    def __init__(self, in_ch, channels, latent_ch):
        super().__init__()
        self.conv_in = nn.Conv2d(in_ch, channels[0], 3, padding=1)
        blocks, prev = [], channels[0]
        for i, ch in enumerate(channels):
            blocks.append(DownBlock(prev, ch, downsample=i < len(channels) - 1))
            prev = ch
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = MidBlock(channels[-1])
        self.conv_norm_out = nn.GroupNorm(32, channels[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(channels[-1], 2 * latent_ch, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class Decoder(nn.Module):
    def __init__(self, out_ch, channels, latent_ch):
        super().__init__()
        rev = list(reversed(channels))
        self.conv_in = nn.Conv2d(latent_ch, rev[0], 3, padding=1)
        self.mid_block = MidBlock(rev[0])
        blocks, prev = [], rev[0]
        for i, ch in enumerate(rev):
            blocks.append(UpBlock(prev, ch, upsample=i < len(rev) - 1))
            prev = ch
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(32, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], out_ch, 3, padding=1)

    def forward(self, z):
        z = self.conv_in(z)
        z = self.mid_block(z)
        for b in self.up_blocks:
            z = b(z)
        return self.conv_out(F.silu(self.conv_norm_out(z)))


class AutoencoderKL(nn.Module):
    """diffusers-shaped AutoencoderKL; encode returns the moments tensor
    (mean ‖ logvar); the wrapper contract takes the mean half."""

    def __init__(self, in_ch=3, channels=(128, 256, 512, 512), latent_ch=4):
        super().__init__()
        self.encoder = Encoder(in_ch, channels, latent_ch)
        self.decoder = Decoder(in_ch, channels, latent_ch)
        self.quant_conv = nn.Conv2d(2 * latent_ch, 2 * latent_ch, 1)
        self.post_quant_conv = nn.Conv2d(latent_ch, latent_ch, 1)
        self.latent_ch = latent_ch

    def encode_mean(self, x):
        moments = self.quant_conv(self.encoder(x))
        return moments[:, : self.latent_ch]

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
