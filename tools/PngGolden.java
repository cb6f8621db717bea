// Independent PNG decode oracle: decodes every *.png in the given
// directory with the JDK's bundled ImageIO PNG reader and writes
// <name>.rgb next to it:
//   4 bytes big-endian height, 4 bytes big-endian width,
//   then height*width*3 bytes row-major sRGB (colormodel-applied via
//   getRGB, so PALETTE lookups and gray expansion happen inside the
//   JDK, independently of our from-scratch decoder).
// Used by tools/gen_goldens.py to produce golden luma hashes for
// markdown_query_ray/pipelines/multimodal.py decode_png_gray — the
// same build-time-oracle pattern as tools/JpegGolden.java.
//
// Run:  java tools/PngGolden.java <dir>

import java.awt.image.BufferedImage;
import java.io.BufferedOutputStream;
import java.io.DataOutputStream;
import java.io.File;
import java.io.FileOutputStream;
import javax.imageio.ImageIO;

public class PngGolden {
    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        File[] files = dir.listFiles((d, n) -> n.endsWith(".png"));
        java.util.Arrays.sort(files);
        for (File f : files) {
            BufferedImage img = ImageIO.read(f);
            int h = img.getHeight(), w = img.getWidth();
            File out = new File(dir, f.getName().replace(".png", ".rgb"));
            try (DataOutputStream o = new DataOutputStream(
                     new BufferedOutputStream(new FileOutputStream(out)))) {
                o.writeInt(h);
                o.writeInt(w);
                for (int y = 0; y < h; y++) {
                    for (int x = 0; x < w; x++) {
                        int rgb = img.getRGB(x, y);
                        o.writeByte((rgb >> 16) & 0xFF);
                        o.writeByte((rgb >> 8) & 0xFF);
                        o.writeByte(rgb & 0xFF);
                    }
                }
            }
        }
    }
}
