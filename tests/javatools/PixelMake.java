// Independent image ENCODER for the meza_spark media tier: takes raw
// pixels on stdin (same "W H B\n" + bytes format PixelDump emits) and
// writes them through the JDK's own codecs, so the stdlib decoders in
// meza_spark/llm/multimodal.py can be exercised against streams no
// code in this repository produced.
//
//   usage: PixelMake <format> <outfile> [compressionType]
//   (format: png gif bmp tiff jpg wbmp; compressionType e.g. the TIFF
//    writer's "LZW" / "PackBits" / "Deflate" / "ZLib")
//
// B=1 builds TYPE_BYTE_GRAY, B=3 TYPE_3BYTE_BGR (logical bands -- the
// raster hides the BGR layout), B=4 TYPE_INT_ARGB; wbmp thresholds at
// 128 into TYPE_BYTE_BINARY.  The GIF writer palettizes internally, so
// callers should feed it few-color images to keep the write lossless;
// JPEG is lossy by nature and is compared with tolerance on the Python
// side.
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;
import java.awt.image.BufferedImage;
import java.awt.image.WritableRaster;
import java.io.BufferedInputStream;
import java.io.DataInputStream;
import java.io.File;
import java.io.InputStream;

public class PixelMake {
  public static void main(String[] args) throws Exception {
    InputStream in = new BufferedInputStream(System.in, 1 << 16);
    StringBuilder hdr = new StringBuilder();
    int c;
    while ((c = in.read()) != -1 && c != '\n') hdr.append((char) c);
    String[] parts = hdr.toString().trim().split(" ");
    int w = Integer.parseInt(parts[0]), h = Integer.parseInt(parts[1]),
        bands = Integer.parseInt(parts[2]);
    if (bands != 1 && bands != 3 && bands != 4)
      // bands==2 (gray+alpha) would fall into TYPE_INT_ARGB below but
      // the sample loop only writes bands 0-1 — reject it loudly
      throw new IllegalArgumentException("bands must be 1, 3, or 4");
    byte[] raw = new byte[w * h * bands];
    new DataInputStream(in).readFully(raw);
    int type = bands == 1 ? BufferedImage.TYPE_BYTE_GRAY
             : bands == 3 ? BufferedImage.TYPE_3BYTE_BGR
             : BufferedImage.TYPE_INT_ARGB;
    BufferedImage img = new BufferedImage(w, h, type);
    WritableRaster r = img.getRaster();
    int i = 0;
    if (bands == 4) {
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int rr = raw[i++] & 0xff, gg = raw[i++] & 0xff,
              bb = raw[i++] & 0xff, aa = raw[i++] & 0xff;
          img.setRGB(x, y, (aa << 24) | (rr << 16) | (gg << 8) | bb);
        }
    } else {
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          for (int b = 0; b < bands; b++)
            r.setSample(x, y, b, raw[i++] & 0xff);
    }
    String fmt = args[0];
    if (fmt.equals("wbmp")) {
      BufferedImage bin = new BufferedImage(w, h,
          BufferedImage.TYPE_BYTE_BINARY);
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int rgb = img.getRGB(x, y);
          int lum = ((rgb >> 16) & 0xff);
          bin.setRGB(x, y, lum >= 128 ? 0xFFFFFF : 0);
        }
      img = bin;
    }
    if (args.length > 2) {
      ImageWriter wr = ImageIO.getImageWritersByFormatName(fmt).next();
      ImageWriteParam p = wr.getDefaultWriteParam();
      if (!args[2].equals("None")) {
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionType(args[2]);
      }
      if (args.length > 4) {  // tiled layout: tileW tileH (TIFF §15)
        p.setTilingMode(ImageWriteParam.MODE_EXPLICIT);
        p.setTiling(Integer.parseInt(args[3]),
                    Integer.parseInt(args[4]), 0, 0);
      }
      try (ImageOutputStream os =
               ImageIO.createImageOutputStream(new File(args[1]))) {
        wr.setOutput(os);
        wr.write(null, new IIOImage(img, null, null), p);
      }
      wr.dispose();
      return;
    }
    if (!ImageIO.write(img, fmt, new File(args[1]))) {
      // Some writers reject the pixel layout (e.g. JPEG vs ARGB):
      // re-draw onto a layout the writer accepts before giving up.
      BufferedImage rgb = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR);
      rgb.createGraphics().drawImage(img, 0, 0, null);
      if (!ImageIO.write(rgb, fmt, new File(args[1]))) {
        System.err.println("no writer for " + fmt);
        System.exit(2);
      }
    }
  }
}
