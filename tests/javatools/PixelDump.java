// Independent image decode oracle for the meza_spark media tier.
//
// Decodes any image javax.imageio understands (JPEG baseline +
// progressive, PNG, GIF, BMP, TIFF, WBMP) using the JDK's own codec
// implementations -- a codebase with zero lineage shared with
// meza_spark/llm/multimodal.py -- and dumps the pixels in a trivial
// raw format for byte-level comparison from pytest:
//
//   stdout:  "W H B\n"  then  W*H*B raw bytes, band-interleaved by
//            pixel, row-major.  B=1 gray, B=2 gray+alpha, B=3 RGB,
//            B=4 RGBA.
//
// Band semantics: for component color models the WritableRaster's
// logical bands are used (band 0 is always red / gray regardless of
// the underlying BGR byte layout), so no color-management math ever
// touches the samples.  Palette images (IndexColorModel) are expanded
// through the palette itself via getRGB -- an exact integer lookup.
// Samples wider than 8 bits are right-shifted to their top byte
// (matching the stdlib decoder's 16-bit contract); samples narrower
// than 8 bits are scaled by 255/(2^n-1) (PNG bit-replication rule).
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.awt.image.Raster;
import java.io.BufferedOutputStream;
import java.io.File;
import java.io.OutputStream;

public class PixelDump {
  public static void main(String[] args) throws Exception {
    BufferedImage img = ImageIO.read(new File(args[0]));
    if (img == null) { System.err.println("unreadable"); System.exit(2); }
    int w = img.getWidth(), h = img.getHeight();
    OutputStream out = new BufferedOutputStream(System.out, 1 << 16);
    if (img.getColorModel() instanceof IndexColorModel) {
      boolean alpha = img.getColorModel().hasAlpha();
      int bands = alpha ? 4 : 3;
      out.write((w + " " + h + " " + bands + "\n").getBytes("ASCII"));
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int argb = img.getRGB(x, y);
          out.write((argb >> 16) & 0xff);
          out.write((argb >> 8) & 0xff);
          out.write(argb & 0xff);
          if (alpha) out.write((argb >> 24) & 0xff);
        }
    } else {
      Raster r = img.getRaster();
      int bands = r.getNumBands();
      int[] sizes = img.getColorModel().getComponentSize();
      out.write((w + " " + h + " " + bands + "\n").getBytes("ASCII"));
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          for (int b = 0; b < bands; b++) {
            int s = r.getSample(x, y, b);
            int n = sizes[Math.min(b, sizes.length - 1)];
            if (n > 8) s >>= (n - 8);
            else if (n < 8) s = s * 255 / ((1 << n) - 1);
            out.write(s & 0xff);
          }
    }
    out.flush();
  }
}
